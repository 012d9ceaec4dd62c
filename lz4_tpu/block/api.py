"""Block-level public API — the analog of the reference's `LZ4Codec` facade
(`LZ4Codec.cs:10-267`): one-shot encode/decode with level routing, partial
decode, and dictionary support.

Backend routing:
- ``backend="host"``: pure-Python scalar codec (`lz4_tpu.block.hostref`) or the
  native C codec when built (`lz4_tpu.native`).
- ``backend="tpu"``: vectorized XLA/Pallas kernels (`lz4_tpu.ops`).
- ``backend="auto"`` (default): native host for small one-shots, TPU for
  larger buffers when a TPU is available.
"""

from __future__ import annotations

from ..constants import LZ4Level, compress_bound
from . import hostref
from ..constants import _as_bytes

__all__ = [
    "compress_bound",
    "maximum_output_size",
    "encode",
    "decode",
    "encode_into",
    "decode_into",
    "partial_decode",
    "LZ4Level",
]


_GEOMETRIES = ("canonical", "dense")


def _check_geometry(geometry: str) -> str:
    if geometry not in _GEOMETRIES:
        raise ValueError(
            f"unknown FAST geometry {geometry!r}; expected one of {_GEOMETRIES}"
        )
    return geometry


def maximum_output_size(length: int) -> int:
    """Reference `LZ4Codec.MaximumOutputSize` (`LZ4Codec.cs:30-31`)."""
    return compress_bound(length)


def _host_encode(
    data: bytes, level: int, dictionary: bytes, acceleration: int,
    geometry: str = "canonical",
) -> bytes:
    try:
        from .. import native

        if native.available():
            return native.encode(
                data, level, dictionary, acceleration, geometry=geometry
            )
    except ImportError:
        pass
    if level < LZ4Level.L03_HC:
        if not dictionary and geometry == "canonical":
            return hostref.encode_fast_canonical(data, acceleration)
        return hostref.encode_fast(data, dictionary, acceleration)
    if level < LZ4Level.L10_OPT:
        return hostref.encode_hc(data, dictionary, level)
    return hostref.encode_opt(data, dictionary, level)


def _stage_dict_window(dictionary):
    """Right-align the last 64 KB of a preset dictionary into the device
    kernels' u8[1, 65536] window layout.  Returns (dicts, dict_lens)."""
    import numpy as np

    win = bytes(dictionary)[-65536:]
    dicts = np.zeros((1, 65536), np.uint8)
    dicts[0, 65536 - len(win):] = np.frombuffer(win, np.uint8)
    return dicts, np.asarray([len(win)], np.int32)


def _tpu_encode(
    data: bytes, level: int, dictionary: bytes, acceleration: int = 1,
    geometry: str = "canonical",
) -> bytes:
    """Explicit-device one-shot.  On a real TPU this routes to the
    production Pallas kernels (staged <= 64 KB, streaming above,
    dictionary mode via the streaming kernel) — the same engines the
    batched `lz4_tpu.parallel` paths ship, ~25-40x the XLA dense kernel
    per chip.  The XLA kernel remains the CPU-mesh fallback.  Shapes are
    power-of-2 bucketed (like the XLA path) to bound per-shape compiles."""
    import numpy as np

    from ..parallel import blocks as PB

    if PB._on_tpu():
        from ..ops.encode_jax import _bucket

        n = len(data)
        bcap = _bucket(max(n, 16))
        errs = None
        if not dictionary and bcap <= PB.PALLAS_MAX_BLOCK:
            from ..ops.encode_pallas5 import encode_blocks_pallas5

            cap = bcap + 1024  # kernel needs cap >= bcap + 256, % 128 == 0
            bufs = np.zeros((1, cap), np.uint8)
            if n:
                bufs[0, :n] = np.frombuffer(data, np.uint8)
            out, clens, errs = encode_blocks_pallas5(
                bufs, np.asarray([n], np.int32), bcap, int(level),
                acceleration, fast_schedule=geometry,
            )
        else:
            from ..ops.encode_pallas_stream import encode_blocks_pallas_stream

            bufs = np.zeros((1, bcap), np.uint8)
            if n:
                bufs[0, :n] = np.frombuffer(data, np.uint8)
            dicts = dict_lens = None
            if dictionary:
                dicts, dict_lens = _stage_dict_window(dictionary)
            out, clens, errs = encode_blocks_pallas_stream(
                bufs, np.asarray([n], np.int32), bcap, int(level),
                acceleration, dicts=dicts, dict_lens=dict_lens,
                fast_schedule=geometry,
            )
        if int(errs[0]):
            from .hostref import LZ4Error

            raise LZ4Error("device encoder overflow")
        return out[0, : int(clens[0])].tobytes()
    from ..ops import encode_jax

    return encode_jax.encode_block_bytes(data, level=level, dictionary=dictionary)


def encode(
    data,
    level: int | LZ4Level = LZ4Level.L00_FAST,
    dictionary: bytes = b"",
    acceleration: int = 1,
    backend: str = "auto",
    target_capacity: int | None = None,
    geometry: str = "canonical",
) -> bytes | None:
    """Compress one block.  Returns the compressed bytes, or ``None`` when
    ``target_capacity`` is given and the result does not fit (the reference
    returns a negative length in that case, `LZ4Codec.cs:40-52`).

    ``geometry`` (FAST levels, no dictionary): "canonical" (default)
    reproduces upstream lz4's one-shot schedule byte-for-byte — the
    reference Fast64 output; "dense" is this library's 15-bit-table finder
    (~1-3% smaller output, ~2x slower).  Chained/dictionary paths always
    use the dense family."""
    data = _as_bytes(data)
    level = int(level)
    _check_geometry(geometry)
    if backend == "tpu":
        # real TPU: production Pallas kernels (canonical-parity FAST at
        # any size).  CPU mesh: the XLA dense-vector kernel, which has its
        # own valid schedule (geometry does not apply there)
        out = _tpu_encode(data, level, dictionary, acceleration, geometry)
    else:
        # "auto" prefers the native host codec for one-shot blocks: a single
        # block cannot amortize a device round-trip (and a cold jit shape
        # costs minutes on the remote-compile tunnel).  The TPU kernels are
        # used by the batched block-parallel paths (`lz4_tpu.parallel`) and
        # on explicit request.
        out = _host_encode(data, level, dictionary, acceleration, geometry)
    if target_capacity is not None and len(out) > target_capacity:
        return None
    return out


def _tpu_decode(data, target_length, dictionary, capacity):
    """Explicit-device one-shot decode via the production Pallas kernels
    on a real TPU (staged <= 64 KB output, streaming above, dictionary
    variants included).  Returns None when the Pallas route does not
    apply (CPU mesh, or no output-size bound to allocate against) — the
    caller falls back to the XLA kernel."""
    import numpy as np

    from ..parallel import blocks as PB

    if not PB._on_tpu():
        return None
    bound = target_length if target_length is not None else capacity
    if bound is None:
        return None  # host/XLA paths size the output dynamically
    from ..constants import compress_bound
    from ..ops.common import align1024
    from ..ops.encode_jax import _bucket
    from .hostref import LZ4Error

    out_cap = _bucket(max(int(bound), 16))
    # the comp staging cap stays on the batched paths' proven shape
    # family (align1024(compress_bound(out_cap))): a VALID block for this
    # output bound cannot be longer (LZ4's length codings have no
    # redundant forms), and a novel larger SMEM shape would risk an
    # avoidable Mosaic allocation failure / fresh remote compile
    cap = align1024(compress_bound(out_cap))
    if len(data) > cap:
        return None  # cannot be a valid block for this bound; let the
        # dynamic-output paths produce the precise error
    comps = np.zeros((1, cap), np.uint8)
    comps[0, : len(data)] = np.frombuffer(data, np.uint8)
    clens = np.asarray([len(data)], np.int32)
    dicts = dlens = None
    if dictionary:
        dicts, dlens = _stage_dict_window(dictionary)
    out, olens, errs = PB.decode_blocks_device(
        comps, clens, out_cap, dicts, dlens
    )
    if int(errs[0]):
        # the device err flag also fires for a WELL-FORMED block whose
        # decoded size exceeds the bucketed out_cap (host paths report a
        # length/capacity mismatch there) — say so rather than mislead
        raise LZ4Error(
            f"malformed block, or decoded output exceeds the "
            f"{int(bound)}-byte bound (device decoder)"
        )
    olen = int(olens[0])
    if target_length is not None and olen != target_length:
        raise LZ4Error(
            f"decoded {olen} bytes, expected {target_length}"
        )
    if target_length is None and olen > capacity:
        # `capacity` is a hard safety bound (host semantics: a crafted
        # block cannot balloon past it), not just an allocation hint —
        # the kernel decodes into the bucketed buffer, so enforce it here
        raise LZ4Error(
            f"decoded {olen} bytes exceeds capacity {capacity}"
        )
    return out[0, :olen].tobytes()


def decode(
    data,
    target_length: int | None = None,
    dictionary: bytes = b"",
    backend: str = "auto",
    capacity: int | None = None,
) -> bytes:
    """Decompress one block (reference `LZ4Codec.Decode`, `LZ4Codec.cs:104-266`).

    ``capacity`` bounds the output allocation when ``target_length`` is
    unknown (e.g. legacy-format blocks with a known maximum size)."""
    data = _as_bytes(data)
    if backend == "tpu":
        out = _tpu_decode(data, target_length, dictionary, capacity)
        if out is not None:
            return out
        from ..ops import decode_jax

        return decode_jax.decode_block_bytes(
            data,
            target_length=target_length,
            dictionary=dictionary,
            capacity=capacity,
        )
    try:
        from .. import native

        if native.available():
            return native.decode(data, target_length, dictionary, capacity=capacity)
    except ImportError:
        pass
    return hostref.decode_block(data, target_length, dictionary, capacity=capacity)


def encode_into(
    data,
    dest,
    level: int | LZ4Level = LZ4Level.L00_FAST,
    dictionary: bytes = b"",
    acceleration: int = 1,
    backend: str = "auto",
    geometry: str = "canonical",
) -> int:
    """Compress one block into a caller-provided writable buffer.

    The analog of the reference's Span-target `LZ4Codec.Encode` overloads
    (`LZ4Codec.cs:59-71`): returns the number of bytes written, or a
    NEGATIVE value when the buffer is too small (mirroring the reference's
    negative-length convention)."""
    view = memoryview(dest).cast("B")
    _check_geometry(geometry)
    if backend != "tpu":
        # zero-copy fast path: with compress_bound room the native encoder
        # writes the caller's buffer directly
        try:
            from .. import native

            if native.available() and len(view) >= compress_bound(
                len(memoryview(data).cast("B"))
            ):
                return native.encode_into(
                    _as_bytes(data), view, int(level),
                    dictionary, acceleration, geometry=geometry,
                )
        except ImportError:
            pass
    comp = encode(
        data, level=level, dictionary=dictionary, acceleration=acceleration,
        backend=backend, geometry=geometry,
    )
    if len(comp) > len(view):
        return -len(comp)
    view[: len(comp)] = comp
    return len(comp)


def decode_into(
    data,
    dest,
    dictionary: bytes = b"",
    backend: str = "auto",
) -> int:
    """Decompress one block into a caller-provided writable buffer.

    Returns the decoded length; raises when the buffer is too small or the
    block is malformed (reference `LZ4Codec.Decode` span overloads)."""
    view = memoryview(dest).cast("B")
    if backend != "tpu":
        # zero-copy fast path: the native decoder writes the caller's
        # buffer directly
        try:
            from .. import native

            if native.available():
                return native.decode_into(
                    _as_bytes(data), view, dictionary
                )
        except ImportError:
            pass
    raw = decode(data, dictionary=dictionary, backend=backend,
                 capacity=len(view))
    if len(raw) > len(view):
        from .hostref import LZ4Error

        raise LZ4Error(
            f"decoded {len(raw)} bytes exceeds destination {len(view)}"
        )
    view[: len(raw)] = raw
    return len(raw)


def partial_decode(
    data, target_length: int, dictionary: bytes = b"", backend: str = "auto"
) -> bytes:
    """Decompress only the first ``target_length`` bytes of a block
    (reference `LZ4Codec.PartialDecode`, `LZ4Codec.cs:123-134`)."""
    data = _as_bytes(data)
    try:
        from .. import native

        if native.available():
            return native.decode(data, target_length, dictionary, partial=True)
    except ImportError:
        pass
    return hostref.decode_block(data, target_length, dictionary, partial=True)


