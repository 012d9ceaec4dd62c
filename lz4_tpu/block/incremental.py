"""Incremental (streaming) block encoders/decoders — the bridge between
"one block" and "a stream of blocks".

Capability analog of the reference's `Encoders/` layer: `ILZ4Encoder`
(`Encoders/ILZ4Encoder.cs:8-35`), `LZ4BlockEncoder`, `LZ4FastChainEncoder`,
`LZ4HighChainEncoder`, `ILZ4Decoder`, `LZ4BlockDecoder`, `LZ4ChainDecoder`
and the `LZ4Encoder.Create`/`LZ4Decoder.Create` factories
(`Encoders/LZ4Encoder.cs:14-19`, `Encoders/LZ4Decoder.cs:13-21`).

Design difference from the reference: the reference manages pinned input
rings with explicit `Topup/Encode/Commit` state machines because it targets
zero-copy .NET interop; here the carry is simply the last 64 KB of raw
history (chained modes), kept as bytes, and blocks are encoded/decoded
one-shot through `lz4_tpu.block.api` (TPU kernels or native host codec).

The reference's `dirty` context flag (a stream poisoned after a failed
compression, `Engine/LL.types.cs:34`) has no counterpart here by
construction: the chain state (`_dict`) is updated only AFTER a block
call returns successfully, so a raised encode/decode leaves the
encoder/decoder at its exact pre-call state — failed calls are
transactional rather than poisoning.
"""

from __future__ import annotations

from ..constants import DISTANCE_MAX, LZ4Level
from . import api as block_api

__all__ = [
    "BlockEncoder",
    "ChainEncoder",
    "BlockDecoder",
    "ChainDecoder",
    "create_encoder",
    "create_decoder",
]

_WINDOW = DISTANCE_MAX + 1  # 64 KB chained-mode history window


class BlockEncoder:
    """Independent-block encoder (reference `LZ4BlockEncoder`,
    `Encoders/LZ4BlockEncoder.cs:7-24`): no history between blocks."""

    chaining = False

    def __init__(self, level: int = 0, block_size: int = 65536,
                 backend: str = "auto", geometry: str = "canonical"):
        self.level = int(level)
        self.block_size = block_size
        self._backend = backend
        self._geometry = geometry

    def encode_block(self, raw: bytes) -> bytes:
        return block_api.encode(
            raw, level=self.level, backend=self._backend,
            geometry=self._geometry,
        )


class ChainEncoder:
    """Chained-block encoder carrying a 64 KB dictionary between blocks
    (reference `LZ4FastChainEncoder`/`LZ4HighChainEncoder` +
    `LZ4_saveDict`, `Engine/LL.tools.cs:195-213`)."""

    chaining = True

    def __init__(self, level: int = 0, block_size: int = 65536, backend: str = "auto"):
        self.level = int(level)
        self.block_size = block_size
        self._backend = backend
        self._dict = b""

    @property
    def dictionary(self) -> bytes:
        return self._dict

    def encode_block(self, raw: bytes) -> bytes:
        # dense geometry throughout the chain (including the dict-less
        # first block) so chained streams are one schedule family and the
        # batched device chain path stays byte-identical
        comp = block_api.encode(
            raw, level=self.level, dictionary=self._dict,
            backend=self._backend, geometry="dense",
        )
        self._dict = (self._dict + raw)[-_WINDOW:]
        return comp

    def reset(self):
        self._dict = b""


class BlockDecoder:
    """Independent-block decoder (reference `LZ4BlockDecoder`)."""

    chaining = False

    def __init__(self, block_size: int = 65536, backend: str = "auto"):
        self.block_size = block_size
        self._backend = backend

    def decode_block(self, comp: bytes, expected_length: int | None = None) -> bytes:
        return block_api.decode(
            comp,
            target_length=expected_length,
            backend=self._backend,
            capacity=self.block_size,
        )

    def inject_block(self, raw: bytes) -> bytes:
        """Accept a stored (uncompressed) block (reference `Inject`)."""
        return raw


class ChainDecoder:
    """Chained-block decoder with 64 KB rolling window (reference
    `LZ4ChainDecoder`, `Encoders/LZ4ChainDecoder.cs:11-152`)."""

    chaining = True

    def __init__(
        self,
        block_size: int = 65536,
        dictionary: bytes = b"",
        backend: str = "auto",
    ):
        self.block_size = block_size
        self._backend = backend
        self._dict = bytes(dictionary[-_WINDOW:])

    @property
    def dictionary(self) -> bytes:
        return self._dict

    def decode_block(self, comp: bytes, expected_length: int | None = None) -> bytes:
        raw = block_api.decode(
            comp,
            target_length=expected_length,
            dictionary=self._dict,
            backend=self._backend,
            capacity=self.block_size,
        )
        self._dict = (self._dict + raw)[-_WINDOW:]
        return raw

    def inject_block(self, raw: bytes) -> bytes:
        """Stored block still participates in the history window
        (reference `LZ4ChainDecoder.Inject`)."""
        self._dict = (self._dict + raw)[-_WINDOW:]
        return raw


def create_encoder(
    chaining: bool,
    level: int | LZ4Level = 0,
    block_size: int = 65536,
    backend: str = "auto",
    geometry: str = "auto",
):
    """Factory (reference `LZ4Encoder.Create`, `Encoders/LZ4Encoder.cs:14-19`).

    geometry="auto" maps to the canonical schedule for independent blocks
    and the dense family for chains; an explicit "canonical" on a CHAIN is
    rejected here — the continue-schedule stream state needs the whole
    buffer up front, which only the one-shot `frame.compress` path has."""
    if geometry not in ("auto", "canonical", "dense"):
        # a typo must not silently coerce to a different schedule
        raise ValueError(
            f"unknown FAST geometry {geometry!r}; "
            "expected 'auto', 'canonical' or 'dense'"
        )
    if chaining:
        if geometry == "canonical" and int(level) < 3:
            raise ValueError(
                "canonical chained (continue-schedule) FAST frames need "
                "the one-shot frame.compress path; the streaming writer "
                "supports geometry='auto'/'dense' chains (HC/OPT chains "
                "are canonical-identical on every path)"
            )
        return ChainEncoder(int(level), block_size, backend)
    return BlockEncoder(
        int(level), block_size, backend,
        "dense" if geometry == "dense" else "canonical",
    )


def create_decoder(
    chaining: bool,
    block_size: int = 65536,
    dictionary: bytes = b"",
    backend: str = "auto",
):
    """Factory (reference `LZ4Decoder.Create`, `Encoders/LZ4Decoder.cs:13-21`)."""
    if chaining:
        return ChainDecoder(block_size, dictionary, backend)
    return BlockDecoder(block_size, backend)
