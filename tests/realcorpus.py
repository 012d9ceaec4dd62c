"""Deterministic REAL-bytes corpus assembled from files baked into this
image (ELF binaries, shared libraries, Python/text sources, misc data).

The reference gates its FAST ratio on the real Silesia corpus
(`ChecksumBlockTests.cs:14-216`); Silesia is not downloadable here, so this
is the stand-in: real-world byte distributions (machine code, symbol
tables, natural-language text, structured data) rather than synthetic
mixes.  Selection is deterministic (sorted walks, fixed per-file caps) so
sizes are stable across runs on one image build.
"""

from __future__ import annotations

import os
import sysconfig

# (root, per-file byte cap, file-name filter) — mixed so no single file
# type dominates: binaries/libraries (x-ray/mozilla-like), Python + text
# sources (dickens/webster-like), tabular/nl data (osdb/nci-like).
_SOURCES = [
    ("/usr/bin", 1 << 20, None),
    ("/usr/lib/x86_64-linux-gnu", 1 << 20, None),
    (sysconfig.get_paths()["stdlib"], 1 << 20, None),
    ("/usr/share/doc", 1 << 20, None),
    ("/etc", 256 << 10, None),
]


def _walk_files(root: str):
    """Deterministic recursive listing: sorted dirs, sorted files."""
    for dirpath, dirnames, filenames in os.walk(root, followlinks=False):
        dirnames.sort()
        for name in sorted(filenames):
            p = os.path.join(dirpath, name)
            if os.path.isfile(p) and not os.path.islink(p):
                yield p


def real_corpus(total_bytes: int) -> bytes:
    """At least ``total_bytes`` of real image bytes, interleaved round-robin
    across the source roots (one file per root per turn, exhausted roots
    drop out and the big roots absorb the remainder)."""
    iters = [
        (_walk_files(root), cap)
        for root, cap, _ in _SOURCES
        if os.path.isdir(root)
    ]
    parts: list[bytes] = []
    got = 0
    while iters and got < total_bytes:
        nxt = []
        for it, cap in iters:
            if got >= total_bytes:
                break
            for p in it:
                try:
                    with open(p, "rb") as f:
                        chunk = f.read(min(cap, total_bytes - got))
                except OSError:
                    continue
                if chunk:
                    parts.append(chunk)
                    got += len(chunk)
                    nxt.append((it, cap))
                    break
            # iterator exhausted (no break above): root drops out
        if not nxt:
            break
        iters = nxt
    out = b"".join(parts)
    if len(out) < total_bytes:
        raise RuntimeError(
            f"image provided only {len(out)} of {total_bytes} corpus bytes"
        )
    return out[:total_bytes]
