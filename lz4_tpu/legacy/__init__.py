"""lz4net-compatible legacy formats.

Capability analog of the reference's `K4os.Compression.LZ4.Legacy` package
(`LZ4Legacy.cs:8-69`): the lz4net varint-chunk stream format
(`Legacy/LZ4Stream.cs:209-295`) and the 8-byte-header "wrap" blob format
(`LZ4Wrapper.cs:10-100`).  Wire formats re-implemented from observed
behavior; code is clean-room.
"""

from .stream import LegacyStreamReader, LegacyStreamWriter, decode, encode  # noqa: F401
from .wrapper import unwrap, wrap, wrap_hc  # noqa: F401
