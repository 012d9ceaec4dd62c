"""LZ4 frame format (`.lz4`) — interoperable stream layer.

Analog of the reference's `K4os.Compression.LZ4.Streams` package: frame
reader/writer, descriptor/settings, one-shot facades and file-like streams.
"""

from .api import (  # noqa: F401
    LZ4FrameFile,
    compress,
    compress_into,
    decompress,
    decompress_into,
    open,
    skippable_frame,
)
from .descriptor import (  # noqa: F401
    DecoderSettings,
    EncoderSettings,
    FrameDescriptor,
)
from .header import LZ4FormatError, build_header, parse_header  # noqa: F401
from .reader import FrameReader  # noqa: F401
from .writer import FrameWriter  # noqa: F401
