"""ctypes binding to the canonical upstream liblz4 (system library).

Test-only helper: the canonical C implementation is the strongest
cross-implementation oracle available in this image — the analog of the
reference's lz4.exe CLI interop rig (reference
`Streams.Tests/Internal/ReferenceLZ4.cs:9-47`).  Tests skip when the
system library is absent.
"""

from __future__ import annotations

import ctypes
import ctypes.util

_CANDIDATES = (
    "/usr/lib/x86_64-linux-gnu/liblz4.so.1",
    "liblz4.so.1",
    "liblz4.so",
)


def _load():
    for name in _CANDIDATES:
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        _declare(lib)
        return lib
    found = ctypes.util.find_library("lz4")
    if found:
        lib = ctypes.CDLL(found)
        _declare(lib)
        return lib
    return None


def _declare(lib):
    c_int, c_cp, c_vp, c_sz = (
        ctypes.c_int, ctypes.c_char_p, ctypes.c_void_p, ctypes.c_size_t,
    )
    lib.LZ4_versionNumber.restype = c_int
    lib.LZ4_compressBound.restype = c_int
    lib.LZ4_compressBound.argtypes = [c_int]
    lib.LZ4_compress_default.restype = c_int
    lib.LZ4_compress_default.argtypes = [c_cp, c_vp, c_int, c_int]
    lib.LZ4_compress_fast.restype = c_int
    lib.LZ4_compress_fast.argtypes = [c_cp, c_vp, c_int, c_int, c_int]
    lib.LZ4_compress_HC.restype = c_int
    lib.LZ4_compress_HC.argtypes = [c_cp, c_vp, c_int, c_int, c_int]
    lib.LZ4_decompress_safe.restype = c_int
    lib.LZ4_decompress_safe.argtypes = [c_cp, c_vp, c_int, c_int]
    lib.LZ4_decompress_safe_partial.restype = c_int
    lib.LZ4_decompress_safe_partial.argtypes = [c_cp, c_vp, c_int, c_int, c_int]
    lib.LZ4_decompress_safe_usingDict.restype = c_int
    lib.LZ4_decompress_safe_usingDict.argtypes = [
        c_cp, c_vp, c_int, c_int, c_cp, c_int,
    ]
    # block streaming (dictionary-seeded encode)
    lib.LZ4_createStream.restype = c_vp
    lib.LZ4_freeStream.restype = c_int
    lib.LZ4_freeStream.argtypes = [c_vp]
    lib.LZ4_loadDict.restype = c_int
    lib.LZ4_loadDict.argtypes = [c_vp, c_cp, c_int]
    lib.LZ4_compress_fast_continue.restype = c_int
    lib.LZ4_compress_fast_continue.argtypes = [
        c_vp, c_cp, c_vp, c_int, c_int, c_int,
    ]
    lib.LZ4_createStreamHC.restype = c_vp
    lib.LZ4_freeStreamHC.restype = c_int
    lib.LZ4_freeStreamHC.argtypes = [c_vp]
    lib.LZ4_resetStreamHC.restype = None
    lib.LZ4_resetStreamHC.argtypes = [c_vp, c_int]
    lib.LZ4_loadDictHC.restype = c_int
    lib.LZ4_loadDictHC.argtypes = [c_vp, c_cp, c_int]
    lib.LZ4_compress_HC_continue.restype = c_int
    lib.LZ4_compress_HC_continue.argtypes = [c_vp, c_cp, c_vp, c_int, c_int]
    # frame API
    lib.LZ4F_isError.restype = ctypes.c_uint
    lib.LZ4F_isError.argtypes = [c_sz]
    lib.LZ4F_getErrorName.restype = c_cp
    lib.LZ4F_getErrorName.argtypes = [c_sz]
    lib.LZ4F_compressFrameBound.restype = c_sz
    lib.LZ4F_compressFrameBound.argtypes = [c_sz, c_vp]
    lib.LZ4F_compressFrame.restype = c_sz
    lib.LZ4F_compressFrame.argtypes = [c_vp, c_sz, c_cp, c_sz, c_vp]
    lib.LZ4F_createDecompressionContext.restype = c_sz
    lib.LZ4F_createDecompressionContext.argtypes = [
        ctypes.POINTER(c_vp), ctypes.c_uint,
    ]
    lib.LZ4F_freeDecompressionContext.restype = c_sz
    lib.LZ4F_freeDecompressionContext.argtypes = [c_vp]
    lib.LZ4F_decompress.restype = c_sz
    lib.LZ4F_decompress.argtypes = [
        c_vp, c_vp, ctypes.POINTER(c_sz), c_cp, ctypes.POINTER(c_sz), c_vp,
    ]


LIB = _load()

LZ4F_VERSION = 100


class Preferences(ctypes.Structure):
    """LZ4F_preferences_t (frame format spec v1.6.1 / lz4frame.h layout)."""

    class FrameInfo(ctypes.Structure):
        _fields_ = [
            ("blockSizeID", ctypes.c_int),       # 0 default, 4-7 = 64K..4MB
            ("blockMode", ctypes.c_int),         # 0 linked, 1 independent
            ("contentChecksumFlag", ctypes.c_int),
            ("frameType", ctypes.c_int),
            ("contentSize", ctypes.c_ulonglong),
            ("dictID", ctypes.c_uint),
            ("blockChecksumFlag", ctypes.c_int),
        ]

    _fields_ = [
        ("frameInfo", FrameInfo),
        ("compressionLevel", ctypes.c_int),
        ("autoFlush", ctypes.c_uint),
        ("favorDecSpeed", ctypes.c_uint),
        ("reserved", ctypes.c_uint * 3),
    ]


def compress_block(data: bytes, level: int = 0) -> bytes:
    bound = LIB.LZ4_compressBound(len(data))
    out = ctypes.create_string_buffer(bound)
    if level >= 3:
        n = LIB.LZ4_compress_HC(data, out, len(data), bound, level)
    else:
        n = LIB.LZ4_compress_default(data, out, len(data), bound)
    assert n > 0, "liblz4 compress failed"
    return out.raw[:n]


def decompress_block(comp: bytes, decoded_size: int) -> bytes:
    out = ctypes.create_string_buffer(max(decoded_size, 1))
    n = LIB.LZ4_decompress_safe(comp, out, len(comp), decoded_size)
    assert n >= 0, f"liblz4 decompress failed ({n})"
    return out.raw[:n]


def decompress_block_partial(comp: bytes, target: int, capacity: int) -> bytes:
    out = ctypes.create_string_buffer(max(capacity, 1))
    n = LIB.LZ4_decompress_safe_partial(comp, out, len(comp), target, capacity)
    assert n >= 0, f"liblz4 partial decompress failed ({n})"
    return out.raw[:n]


def compress_block_with_dict(data: bytes, dictionary: bytes, level: int = 0) -> bytes:
    bound = LIB.LZ4_compressBound(len(data))
    out = ctypes.create_string_buffer(bound)
    if level >= 3:
        st = LIB.LZ4_createStreamHC()
        LIB.LZ4_resetStreamHC(st, level)
        LIB.LZ4_loadDictHC(st, dictionary, len(dictionary))
        n = LIB.LZ4_compress_HC_continue(st, data, out, len(data), bound)
        LIB.LZ4_freeStreamHC(st)
    else:
        st = LIB.LZ4_createStream()
        LIB.LZ4_loadDict(st, dictionary, len(dictionary))
        n = LIB.LZ4_compress_fast_continue(st, data, out, len(data), bound, 1)
        LIB.LZ4_freeStream(st)
    assert n > 0, "liblz4 dict compress failed"
    return out.raw[:n]


def decompress_block_with_dict(
    comp: bytes, decoded_size: int, dictionary: bytes
) -> bytes:
    out = ctypes.create_string_buffer(max(decoded_size, 1))
    n = LIB.LZ4_decompress_safe_usingDict(
        comp, out, len(comp), decoded_size, dictionary, len(dictionary)
    )
    assert n >= 0, f"liblz4 dict decompress failed ({n})"
    return out.raw[:n]


def compress_blocks_continue(
    data: bytes, block_size: int, accel: int = 1
) -> list[bytes]:
    """Chained (linked-block) compression of a contiguous buffer through
    one canonical LZ4_compress_fast_continue stream: block k's window is
    the in-place prefix, exactly the frame writer's linked-block layout.
    Returns the per-block compressed payloads."""
    lib = _load()
    st = lib.LZ4_createStream()
    assert st
    try:
        out = []
        cap = lib.LZ4_compressBound(block_size)
        buf = ctypes.create_string_buffer(cap)
        base = ctypes.cast(ctypes.c_char_p(data), ctypes.c_void_p).value
        for off in range(0, len(data), block_size):
            blen = min(block_size, len(data) - off)
            n = lib.LZ4_compress_fast_continue(
                st, ctypes.c_char_p(base + off), buf, blen, cap, accel
            )
            assert n > 0, (off, n)
            out.append(buf.raw[:n])
        return out
    finally:
        lib.LZ4_freeStream(st)


def compress_frame(
    data: bytes,
    *,
    level: int = 0,
    block_size_id: int = 0,
    independent: bool = False,
    content_checksum: bool = False,
    block_checksum: bool = False,
    content_size: bool = False,
) -> bytes:
    prefs = Preferences()
    prefs.frameInfo.blockSizeID = block_size_id
    prefs.frameInfo.blockMode = 1 if independent else 0
    prefs.frameInfo.contentChecksumFlag = 1 if content_checksum else 0
    prefs.frameInfo.blockChecksumFlag = 1 if block_checksum else 0
    prefs.frameInfo.contentSize = len(data) if content_size else 0
    prefs.compressionLevel = level
    bound = LIB.LZ4F_compressFrameBound(len(data), ctypes.byref(prefs))
    out = ctypes.create_string_buffer(bound)
    n = LIB.LZ4F_compressFrame(
        out, bound, data, len(data), ctypes.byref(prefs)
    )
    assert not LIB.LZ4F_isError(n), LIB.LZ4F_getErrorName(n)
    return out.raw[:n]


def decompress_frame(blob: bytes, expected_size_hint: int = 1 << 20) -> bytes:
    ctx = ctypes.c_void_p()
    rc = LIB.LZ4F_createDecompressionContext(
        ctypes.byref(ctx), LZ4F_VERSION
    )
    assert not LIB.LZ4F_isError(rc)
    try:
        out = ctypes.create_string_buffer(max(expected_size_hint, 1 << 16))
        result = bytearray()
        src_off = 0
        while src_off < len(blob):
            dst_sz = ctypes.c_size_t(len(out))
            src_sz = ctypes.c_size_t(len(blob) - src_off)
            rc = LIB.LZ4F_decompress(
                ctx, out, ctypes.byref(dst_sz),
                blob[src_off:], ctypes.byref(src_sz), None,
            )
            assert not LIB.LZ4F_isError(rc), LIB.LZ4F_getErrorName(rc)
            result += out.raw[: dst_sz.value]
            if src_sz.value == 0 and dst_sz.value == 0:
                break
            src_off += src_sz.value
        return bytes(result)
    finally:
        LIB.LZ4F_freeDecompressionContext(ctx)
