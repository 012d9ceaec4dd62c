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


def _tpu_encode(data: bytes, level: int, dictionary: bytes) -> bytes:
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
        # the XLA dense-vector kernel (CPU-mesh fallback) has its own valid
        # schedule; geometry selects between the host/Pallas engines only
        out = _tpu_encode(data, level, dictionary)
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


