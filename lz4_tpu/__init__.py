"""lz4_tpu — a TPU-native LZ4 compression framework.

A from-scratch JAX/XLA/Pallas re-design with the capability surface of
`K4os.Compression.LZ4` (LZ4 block codec with the full level ladder, the LZ4
frame/stream format, pickler, legacy formats, xxHash32), engineered for TPU
hardware: vectorized match finding, pointer-doubling parsing, prefix-sum
sequence emission, and block-parallel sharding across device meshes.

Layer map (mirrors reference SURVEY §1):
- `lz4_tpu.constants`      — format constants (L0 analog)
- `lz4_tpu.block`          — block codec API + scalar host oracle (L1/L2)
- `lz4_tpu.ops`            — vectorized TPU encode/decode kernels (L1 ⚡)
- `lz4_tpu.pickler`        — self-contained compressed blobs (L2)
- `lz4_tpu.frame`          — LZ4 frame format reader/writer/streams (L4/L5)
- `lz4_tpu.legacy`         — lz4net-compatible stream + wrap formats (L6)
- `lz4_tpu.parallel`       — block-parallel sharding over device meshes
- `lz4_tpu.xxh32`          — xxHash32 (X)
"""

from .constants import LZ4Level, compress_bound
from .block.api import (decode, decode_into, encode, encode_into,
                        maximum_output_size, partial_decode)
from .block.hostref import LZ4Error
from .pickler import pickle, pickle_into, unpickle, unpickle_into
from .pickler import unpickled_size
from .xxh32 import XXH32, xxh32

__version__ = "0.3.0"

__all__ = [
    "LZ4Level",
    "LZ4Error",
    "compress_bound",
    "maximum_output_size",
    "encode",
    "decode",
    "encode_into",
    "decode_into",
    "partial_decode",
    "pickle",
    "pickle_into",
    "unpickle",
    "unpickle_into",
    "unpickled_size",
    "XXH32",
    "xxh32",
]
