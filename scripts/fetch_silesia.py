#!/usr/bin/env python3
"""Fetch the Silesia corpus into `.corpus/` so the golden-size gate runs.

One-command analog of the reference's corpus restore
(`src/FsBuildTools/Downloads.fs:23-50`, `restoreCorpusFile`): download the
12 per-file zips from the SilesiaCorpus GitHub mirror, unpack with the
stdlib zipfile module (no 7za needed — they are plain zip archives), and
verify each file's exact size against the golden table before accepting it.
`tests/test_silesia_golden.py` auto-activates the moment the files exist,
with no human assembly.

Usage:  python scripts/fetch_silesia.py [dest_dir]
        (default dest: <repo>/.corpus, or $LZ4TPU_SILESIA_DIR)

Idempotent: files already present with the right size are skipped, so a
partially-failed run resumes.  Exits non-zero if any file could not be
fetched and verified (e.g. no network in this environment).
"""

from __future__ import annotations

import io
import os
import sys
import urllib.request
import zipfile

# file -> exact original size (reference ChecksumBlockTests.cs:39-50 /
# BASELINE.md §B — the same table tests/test_silesia_golden.py asserts)
SIZES = {
    "dickens": 10192446,
    "mozilla": 51220480,
    "mr": 9970564,
    "nci": 33553445,
    "ooffice": 6152192,
    "osdb": 10085684,
    "reymont": 6627202,
    "samba": 21606400,
    "sao": 7251944,
    "webster": 41458703,
    "xml": 5345280,
    "x-ray": 8474240,
}

URL = "https://github.com/MiloszKrajewski/SilesiaCorpus/blob/master/{}.zip?raw=true"
# fallback: the original corpus host (tar-less per-file zips not offered
# there, so only the mirror above is tried per file; kept as a pointer)
FALLBACK_NOTE = "http://sun.aei.polsl.pl/~sdeor/corpus/silesia.zip"


def fetch_one(name: str, dest_dir: str) -> bool:
    path = os.path.join(dest_dir, name)
    want = SIZES[name]
    if os.path.isfile(path) and os.path.getsize(path) == want:
        print(f"  {name}: already present ({want} bytes)")
        return True
    url = URL.format(name)
    print(f"  {name}: downloading {url}")
    try:
        req = urllib.request.Request(url, headers={"User-Agent": "lz4_tpu-fetch"})
        with urllib.request.urlopen(req, timeout=120) as r:
            blob = r.read()
    except Exception as e:  # no network / mirror gone: report, keep going
        print(f"  {name}: FAILED to download ({e})")
        return False
    try:
        with zipfile.ZipFile(io.BytesIO(blob)) as z:
            inner = z.namelist()[0]
            data = z.read(inner)
    except zipfile.BadZipFile as e:
        print(f"  {name}: FAILED to unzip ({e})")
        return False
    if len(data) != want:
        print(f"  {name}: size mismatch ({len(data)} != {want}); rejected")
        return False
    tmp = path + ".part"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    print(f"  {name}: OK ({want} bytes)")
    return True


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dest = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.environ.get("LZ4TPU_SILESIA_DIR")
        or os.path.join(repo, ".corpus")
    )
    os.makedirs(dest, exist_ok=True)
    print(f"Fetching Silesia corpus into {dest}")
    ok = sum(fetch_one(n, dest) for n in sorted(SIZES))
    print(f"{ok}/{len(SIZES)} files present and size-verified.")
    if ok == len(SIZES):
        print("Run the gate:  python -m pytest tests/test_silesia_golden.py -q")
        return 0
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
