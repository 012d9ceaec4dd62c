"""Native host codec loader.

Builds (once, on demand) and loads ``liblz4tpu.so`` — the C host-side block
codec + xxHash32 (`lz4tpu.c`).  Falls back gracefully when no C compiler is
available: ``available()`` returns False and callers use the pure-Python
oracle or the TPU kernels instead.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "lz4tpu.c")
_LIB = os.path.join(_HERE, f"liblz4tpu-{sys.implementation.cache_tag}.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    # build machine == run machine (compiled on demand), so -march=native
    # is safe; retry without it for compilers that reject the flag
    flag_sets = (
        ["-O3", "-march=native", "-shared", "-fPIC"],
        ["-O3", "-shared", "-fPIC"],
    )
    for cc in ("cc", "gcc", "clang"):
        for flags in flag_sets:
            try:
                r = subprocess.run(
                    [cc, *flags, "-o", _LIB + ".tmp", _SRC],
                    capture_output=True,
                    timeout=120,
                )
            except (OSError, subprocess.TimeoutExpired):
                continue
            if r.returncode == 0:
                os.replace(_LIB + ".tmp", _LIB)
                return True
    return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        # src/buf pointers are c_void_p: ctypes converts bytes to their
        # buffer address zero-copy, and integer addresses pass through —
        # the span entry points below rely on both
        lib.lz4tpu_decode.restype = ctypes.c_int64
        lib.lz4tpu_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.lz4tpu_encode_fast.restype = ctypes.c_int64
        lib.lz4tpu_encode_fast.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
        ]
        lib.lz4tpu_encode_fast_canonical.restype = ctypes.c_int64
        lib.lz4tpu_encode_fast_canonical.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
        ]
        lib.lz4tpu_encode_fast_continue.restype = ctypes.c_int64
        lib.lz4tpu_encode_fast_continue.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_void_p,
        ]
        lib.lz4tpu_encode_hc.restype = ctypes.c_int64
        lib.lz4tpu_encode_hc.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
        ]
        lib.lz4tpu_encode_opt.restype = ctypes.c_int64
        lib.lz4tpu_encode_opt.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
        ]
        lib.lz4tpu_xxh32.restype = ctypes.c_uint32
        lib.lz4tpu_xxh32.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_uint32,
        ]
        lib.lz4tpu_xxh32_stripes.restype = None
        lib.lz4tpu_xxh32_stripes.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_char_p, ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _require():
    """_load() or a clear error.  Direct callers of this module's codec
    functions (benches, scripts) get 'native codec unavailable' instead of
    an AttributeError on None when the on-demand cc build failed."""
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "native codec unavailable: the on-demand C build failed or no "
            "compiler exists (gate with lz4_tpu.native.available())"
        )
    return lib


def encode(
    data: bytes, level: int = 0, dictionary: bytes = b"",
    acceleration: int = 1, geometry: str = "canonical",
) -> bytes:
    """Compress one block; dictionary is prefixed history.

    ``geometry`` selects the FAST match-finder table shape (no effect at
    HC/OPT levels or with a dictionary): "canonical" (default) reproduces
    upstream lz4's schedule byte-for-byte — the reference's Fast64 output;
    "dense" keeps the 15-bit table (~1-3% smaller output, ~2x slower)."""
    from ..constants import DISTANCE_MAX, compress_bound

    lib = _require()
    dictionary = bytes(dictionary[-(DISTANCE_MAX + 1) :])
    buf = dictionary + bytes(data)
    out_cap = compress_bound(len(data))
    # uninitialized scratch (no memset pass), one copy out
    import numpy as np

    scratch = np.empty(out_cap, np.uint8)
    out = _waddr(scratch)
    if level < 3 and not dictionary and geometry == "canonical":
        rc = lib.lz4tpu_encode_fast_canonical(
            buf, len(buf), out, out_cap, acceleration
        )
    elif level < 3:
        rc = lib.lz4tpu_encode_fast(
            buf, len(buf), len(dictionary), out, out_cap, acceleration
        )
    elif level < 10:
        rc = lib.lz4tpu_encode_hc(
            buf, len(buf), len(dictionary), out, out_cap, level
        )
    else:
        rc = lib.lz4tpu_encode_opt(
            buf, len(buf), len(dictionary), out, out_cap, level
        )
    if rc < 0:
        raise RuntimeError(f"native encode failed ({rc})")
    return ctypes.string_at(out, rc)


def encode_into(
    data, dst, level: int = 0, dictionary: bytes = b"",
    acceleration: int = 1, geometry: str = "canonical",
) -> int:
    """Compress one block directly into a writable buffer (zero-copy).

    The caller must provide at least compress_bound(len(data)) bytes —
    checked here — so the C encoder never overflows.  Returns the
    compressed length."""
    from ..constants import DISTANCE_MAX, compress_bound

    lib = _require()
    dictionary = bytes(dictionary[-(DISTANCE_MAX + 1) :])
    buf = dictionary + bytes(data)
    view = memoryview(dst).cast("B")
    if view.readonly:
        raise ValueError("destination buffer is read-only")
    need = compress_bound(len(buf) - len(dictionary))
    if len(view) < need:
        raise ValueError(
            f"destination {len(view)} < compress_bound {need}"
        )
    out = (ctypes.c_char * len(view)).from_buffer(view)
    if level < 3 and not dictionary and geometry == "canonical":
        rc = lib.lz4tpu_encode_fast_canonical(
            buf, len(buf), ctypes.addressof(out), len(view), acceleration
        )
    elif level < 3:
        rc = lib.lz4tpu_encode_fast(
            buf, len(buf), len(dictionary), ctypes.addressof(out),
            len(view), acceleration
        )
    elif level < 10:
        rc = lib.lz4tpu_encode_hc(
            buf, len(buf), len(dictionary), ctypes.addressof(out),
            len(view), level
        )
    else:
        rc = lib.lz4tpu_encode_opt(
            buf, len(buf), len(dictionary), ctypes.addressof(out),
            len(view), level
        )
    if rc < 0:
        raise RuntimeError(f"native encode failed ({rc})")
    return rc


def chained_canonical_blocks(
    data: bytes, block_size: int, acceleration: int = 1
) -> list[bytes]:
    """Linked-block compression of a contiguous buffer, byte-identical to
    upstream LZ4_compress_fast_continue (one persistent stream): the
    canonical chained-frame schedule.  Returns per-block payloads."""
    import numpy as np

    from ..constants import compress_bound

    lib = _require()
    data = bytes(data)
    if len(data) > (1 << 31) - (64 << 20):
        # upstream renormalizes its stream state near 2 GiB; this engine
        # stores absolute u32 positions without renorm, so bound the
        # one-shot frame size explicitly rather than silently diverge
        raise ValueError(
            "canonical chained encoding supports up to ~2 GiB per frame"
        )
    table = np.zeros(1 << 12, np.uint32)  # CANON_HASHLOG_U32 entries
    taddr = table.ctypes.data
    cap = compress_bound(block_size)
    scratch = np.empty(cap, np.uint8)
    out_addr = _waddr(scratch)
    payloads = []
    for off in range(0, len(data), block_size):
        blen = min(block_size, len(data) - off)
        rc = lib.lz4tpu_encode_fast_continue(
            data, off, blen, out_addr, cap, acceleration, taddr
        )
        if rc < 0:
            raise RuntimeError(f"native chained encode failed ({rc})")
        payloads.append(ctypes.string_at(out_addr, rc))
    return payloads


def decode(
    data: bytes,
    target_length: int | None = None,
    dictionary: bytes = b"",
    partial: bool = False,
    capacity: int | None = None,
) -> bytes:
    from ..block.hostref import LZ4Error

    lib = _require()
    data = bytes(data)
    if not data:
        raise LZ4Error("empty input")
    if target_length is not None and not partial:
        # exact-size decode: straight into the final (uninitialized) bytes
        # object — no memset, no result copy
        result = alloc_uninit_bytes(target_length)
        rc = lib.lz4tpu_decode(
            data, len(data), bytes(dictionary), len(dictionary),
            _addr(result) if target_length else None, target_length, -1,
        )
        if rc < 0:
            raise LZ4Error(f"malformed LZ4 block (native rc={rc})")
        if rc != target_length:
            raise LZ4Error(
                f"decoded length {rc} != expected {target_length}"
            )
        return result
    if partial and target_length is not None:
        out_cap = target_length
        target = target_length
    elif target_length is not None:
        out_cap = target_length
        target = -1
    else:
        # no size hint: start small and grow on ERR_OUTPUT_OVERFLOW instead
        # of eagerly allocating the worst-case 255x expansion (a crafted
        # 4 MB block would otherwise demand ~1 GB up front)
        out_cap = capacity if capacity is not None else max(256, len(data) * 4)
        target = -1
    hard_cap = (
        capacity
        if capacity is not None
        else max(256, len(data) * 255)
        if target_length is None
        else out_cap
    )
    while True:
        out = ctypes.create_string_buffer(max(out_cap, 1))
        rc = lib.lz4tpu_decode(
            data, len(data), bytes(dictionary), len(dictionary), out, out_cap, target
        )
        if rc == -2 and out_cap < hard_cap:  # ERR_OUTPUT_OVERFLOW: grow
            out_cap = min(out_cap * 8, hard_cap)
            continue
        break
    if rc < 0:
        raise LZ4Error(f"malformed LZ4 block (native rc={rc})")
    if target_length is not None and not partial and rc != target_length:
        raise LZ4Error(f"decoded length {rc} != expected {target_length}")
    return out.raw[:rc]


def decode_into(data, dst, dictionary: bytes = b"") -> int:
    """Decode one block directly into a writable buffer (zero-copy: no
    create_string_buffer memset, no result-slice copy — the C decoder
    writes the caller's memory).  Returns the decoded length; raises on
    malformed input or an undersized buffer."""
    from ..block.hostref import LZ4Error

    lib = _require()
    data = bytes(data)
    if not data:
        raise LZ4Error("empty input")
    view = memoryview(dst).cast("B")
    if view.readonly:
        raise LZ4Error("destination buffer is read-only")
    buf = (ctypes.c_char * len(view)).from_buffer(view)
    rc = lib.lz4tpu_decode(
        data, len(data), bytes(dictionary), len(dictionary),
        ctypes.addressof(buf), len(view), -1,
    )
    if rc < 0:
        raise LZ4Error(f"malformed LZ4 block (native rc={rc})")
    return rc


def xxh32(data: bytes, seed: int = 0) -> int:
    lib = _require()
    return int(lib.lz4tpu_xxh32(bytes(data), len(data), seed & 0xFFFFFFFF))


def _addr(buf) -> int:
    """Buffer base address of a bytes object (zero-copy, read-only use).

    The caller must keep `buf` referenced across the C call."""
    return ctypes.cast(ctypes.c_char_p(buf), ctypes.c_void_p).value


def _waddr(buf) -> int:
    """Buffer base address of a writable bytes-like (bytearray/memoryview)."""
    return ctypes.addressof((ctypes.c_char * 0).from_buffer(buf))


def alloc_uninit_bytes(n: int):
    """A fresh, UNINITIALIZED ``bytes`` of length n (PyBytes with no memset).

    On this VM memcpy/memset run at ~1.5-3 GB/s — for a multi-GB/s codec the
    usual allocate-zeroed + fill + copy-to-bytes dance costs more than the
    decode itself.  The caller owns the only reference and must overwrite
    every byte before exposing the object.  Falls back to zeroed bytes if
    the CPython C API is unavailable."""
    try:
        f = ctypes.pythonapi.PyBytes_FromStringAndSize
        f.restype = ctypes.py_object
        f.argtypes = [ctypes.c_char_p, ctypes.c_ssize_t]
        return f(None, n)
    except Exception:
        return bytes(n)


def decode_span(
    src: bytes, src_off: int, src_len: int,
    dst, dst_off: int, dst_cap: int,
    dict_addr: int = 0, dict_len: int = 0,
) -> int:
    """Decode src[src_off:src_off+src_len] into dst[dst_off:dst_off+dst_cap]
    with NO intermediate copies or allocations — the GIL drops for the whole
    C call, so thread pools scale to physical cores (the `lz4 -T` analog the
    threaded frame paths use).  ``dst`` is a writable buffer, or an int raw
    base address (caller guarantees validity).  ``dict_addr``/``dict_len``
    point at the 64 KB window for chained blocks — for a contiguous output
    buffer that is just ``base + dst_off - dict_len``, so chained decode
    carries its window with zero copies.  Returns the decoded length."""
    from ..block.hostref import LZ4Error

    lib = _require()
    if src_off < 0 or src_len <= 0 or src_off + src_len > len(src):
        raise LZ4Error("source span out of range")
    base = dst if isinstance(dst, int) else _waddr(dst)
    rc = lib.lz4tpu_decode(
        _addr(src) + src_off, src_len,
        dict_addr if dict_len else None, dict_len,
        base + dst_off, dst_cap, -1,
    )
    if rc < 0:
        raise LZ4Error(f"malformed LZ4 block (native rc={rc})")
    return rc


def encode_span(
    src: bytes, src_off: int, src_len: int,
    dst, dst_off: int, dst_cap: int,
    level: int = 0, acceleration: int = 1, dict_len: int = 0,
    geometry: str = "canonical",
) -> int:
    """Compress src[src_off:src_off+src_len] into dst[dst_off:...] with no
    copies (GIL-dropping, thread-scalable).  ``dict_len`` bytes immediately
    BEFORE src_off serve as the dictionary window — for chained frames over
    one contiguous buffer the previous 64 KB is already in place, so chained
    encode is zero-copy too.  Returns the compressed length (may exceed
    src_len up to compress_bound; size the span accordingly)."""
    lib = _require()
    if src_off < 0 or src_len < 0 or src_off + src_len > len(src):
        raise ValueError("source span out of range")
    if dict_len > src_off:
        raise ValueError("dictionary window precedes the buffer")
    base = _addr(src) + src_off - dict_len
    out = _waddr(dst) + dst_off
    if level < 3 and dict_len == 0 and geometry == "canonical":
        rc = lib.lz4tpu_encode_fast_canonical(
            base, src_len, out, dst_cap, acceleration
        )
    elif level < 3:
        rc = lib.lz4tpu_encode_fast(
            base, dict_len + src_len, dict_len, out, dst_cap, acceleration
        )
    elif level < 10:
        rc = lib.lz4tpu_encode_hc(
            base, dict_len + src_len, dict_len, out, dst_cap, level
        )
    else:
        rc = lib.lz4tpu_encode_opt(
            base, dict_len + src_len, dict_len, out, dst_cap, level
        )
    if rc < 0:
        raise RuntimeError(f"native encode failed ({rc})")
    return rc
