"""The reference's Silesia golden-size table, committed as a corpus-gated
test (VERDICT round-2 item #4).

Table source: `/root/reference/src/K4os.Compression.LZ4.Tests/
ChecksumBlockTests.cs` (Fast64 `:39-50`, High64 `:125-172`), tabulated in
BASELINE.md §B.  The corpus is not downloadable in this environment; the
moment the 12 Silesia files land in `.corpus/` at the repo root (or a
directory named by `LZ4TPU_SILESIA_DIR`) these activate:

- HC/OPT levels (L3/L9/L10/L12): exact compressed-size equality (our HC is
  byte-identical to canonical; the reference's table is canonical lz4 1.9.x).
- FAST (L0): size <= the reference Fast64 value (different valid streams).
- All levels: bit-exact roundtrip.
"""

import os

import pytest

from lz4_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native engine unavailable"
)

# file -> (original, L0_fast64, L3, L9, L10, L12)  [BASELINE.md §B]
GOLDEN = {
    "dickens": (10192446, 6428742, 4777698, 4432823, 4387799, 4376097),
    "mozilla": (51220480, 26435667, 22612180, 22078791, 22104093, 22014250),
    "mr": (9970564, 5440937, 4645737, 4245211, 4211991, 4189363),
    "nci": (33553445, 5533040, 4251597, 3673771, 3713658, 3617512),
    "ooffice": (6152192, 4338918, 3607577, 3543764, 3538803, 3535250),
    "osdb": (10085684, 5256666, 4045536, 3977505, 3946371, 3946233),
    "reymont": (6627202, 3181387, 2428406, 2111095, 2090314, 2063052),
    "samba": (21606400, 7716839, 6309627, 6139489, 6111537, 6095902),
    "sao": (7251944, 6790273, 5871276, 5735258, 5675760, 5668734),
    "webster": (41458703, 20139988, 14737393, 14001448, 13874032, 13823143),
    "xml": (5345280, 1227495, 852824, 770055, 769191, 759893),
    "x-ray": (8474240, 8390195, 7202248, 7175001, 7172973, 7172970),
}

LEVEL_COLUMNS = {0: 1, 3: 2, 9: 3, 10: 4, 12: 5}


def _corpus_dir() -> str | None:
    cand = os.environ.get("LZ4TPU_SILESIA_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".corpus",
    )
    return cand if os.path.isdir(cand) else None


def _load(name: str) -> bytes:
    d = _corpus_dir()
    if d is None:
        pytest.skip("Silesia corpus not present (.corpus/ or LZ4TPU_SILESIA_DIR)")
    p = os.path.join(d, name)
    if not os.path.isfile(p):
        pytest.skip(f"Silesia file {name} not present")
    with open(p, "rb") as f:
        return f.read()


@pytest.mark.parametrize("name", sorted(GOLDEN))
@pytest.mark.parametrize("level", sorted(LEVEL_COLUMNS))
def test_silesia_golden_sizes(name, level):
    data = _load(name)
    row = GOLDEN[name]
    assert len(data) == row[0], f"{name}: corpus file size mismatch"
    comp = native.encode(data, level)
    expected = row[LEVEL_COLUMNS[level]]
    if level == 0:
        # FAST streams differ between implementations; the gate is <=
        assert len(comp) <= expected, (name, level, len(comp), expected)
    else:
        # HC/OPT: byte-identical engine -> exact size equality
        assert len(comp) == expected, (name, level, len(comp), expected)
    assert native.decode(comp, len(data)) == data, (name, level)


# ---------------------------------------------------------------------------
# Full-fidelity High64 rows (round 5): the reference asserts not only the
# compressed SIZE but the Adler32 of the compressed bytes and the first 60
# compressed bytes (base64) — `ChecksumBlockTests.cs:204-210`, Adler32 at
# `TestHelpers/Tools.cs:14-44` (standard zlib semantics, a=1 seed).  Our
# HC/OPT engines are byte-identical to canonical liblz4 (which the
# reference's High64 table pins), so these 48 rows must match EXACTLY.
# The reference's Fast64 rows are its own engine's (different valid bytes
# from canonical), so FAST stays a size-<= gate above.
# (file, level) -> (compressed_size, adler32_of_compressed, first60_b64)
GOLDEN_HC64 = {
    ("dickens", 3): (4777698, 0x3dcf78af, "8CMqKlRoZSBQcm9qZWN0IEd1dGVuYmVyZyBFdGV4dCBvZiBBIENoaWxkJ3MgSGlzdG9yeRUA8CJFbmds"),
    ("mozilla", 3): (22612180, 0xf068ebda, "n21vemlsbGEvAAEASOAgNDA3NTUgACAgMjYwMAgANCAgIAgAAw0A/wcgNzQ3NTc0Mjc2MSAgMTA3NjUA"),
    ("mr", 3): (4645737, 0x165d96a1, "8CEIAAUACgAAAElTT19JUiAxMDAIAAgAFgAAAE9SSUdJTkFMXFBSSU1BUllcT1RIRVIcAPAKGgAAADEu"),
    ("nci", 3): (4251597, 0x9f84ce91, "8BYxNTU1NDIKUk90Y2xzZXJ2ZTExMTUwMDExMjEyRCAwICAgMC4wAQAmICAMAP8EMTA0OTUyMQogCiAz"),
    ("ooffice", 3): (3607577, 0xa67753d, "8gNNWpAAAwAAAAQAAAD//wAAuAABAC9AAAEAD/Mu8AAAAA4fug4AtAnNIbgBTM0hVGhpcyBwcm9ncmFt"),
    ("osdb", 3): (4045536, 0x3a6a79a5, "8w4DAE8BYAIThAEAAHUlBa4AAAC5za/NhecSTgw2MQIA8T0uMDAJNy8xNy8xOTQ0RmhYVHViOlpRTjVt"),
    ("reymont", 3): (2428406, 0xfe26edd1, "8hElUERGLTEuMwozIDAgb2JqIDw8Ci9MZW5ndGggMTUzIAEA8SgKPj4Kc3RyZWFtCjEgMCAwIDEgMjQ0"),
    ("samba", 3): (6309627, 0xe6526ec0, "73NhbWJhLTIuMi4zYS8AAQBD8AAwMDQwNzU1ADAwMDE3NjEIAGYwMTUyADABAP8IADA3NDI3MTA0MDIw"),
    ("sao", 3): (5871276, 0x1e04b294, "xAAAAAABAAAAtfMDAAwAAAQA8EUcAAAA1Ke7C7dKOD9rphXawBf3P0Ew0AKZBiK1qpQmMrdL+Jif5EY/"),
    ("webster", 3): (14737393, 0x18019ec6, "8BINClRoZSBQcm9qZWN0IEd1dGVuYmVyZyBFdGV4dCBvZiAfAPCaMTkxMyBXZWJzdGVyIFVuYWJyaWRn"),
    ("x-ray", 3): (7202248, 0xab436ed2, "/w/QAQAQB2wItgAQAAEBEQ6zRlNfQS4zMTk3LmltZwABAA9/QkxLTTE4AAEAFlM4MDAxMDEA8g84MC44"),
    ("xml", 3): (852824, 0x895b66f6, "n2VsdHMueG1sAAEASOkxMDA3NzUgACAgIDc2NAgA/xAgIDMzNDc1NyAgNzE3NDM2NjM3MCAgMTIyMDEA"),
    ("dickens", 9): (4432823, 0x29bb5b4b, "8CMqKlRoZSBQcm9qZWN0IEd1dGVuYmVyZyBFdGV4dCBvZiBBIENoaWxkJ3MgSGlzdG9yeRUA8CJFbmds"),
    ("mozilla", 9): (22078791, 0x90af8101, "n21vemlsbGEvAAEASOAgNDA3NTUgACAgMjYwMAgANCAgIAgAAw0A/wcgNzQ3NTc0Mjc2MSAgMTA3NjUA"),
    ("mr", 9): (4245211, 0x8580d2de, "8CEIAAUACgAAAElTT19JUiAxMDAIAAgAFgAAAE9SSUdJTkFMXFBSSU1BUllcT1RIRVIcAPAKGgAAADEu"),
    ("nci", 9): (3673771, 0x2228a9f3, "8BYxNTU1NDIKUk90Y2xzZXJ2ZTExMTUwMDExMjEyRCAwICAgMC4wAQAmICAMAP8EMTA0OTUyMQogCiAz"),
    ("ooffice", 9): (3543764, 0xc8b15e1a, "8gNNWpAAAwAAAAQAAAD//wAAuAABAC9AAAEAD/Mu8AAAAA4fug4AtAnNIbgBTM0hVGhpcyBwcm9ncmFt"),
    ("osdb", 9): (3977505, 0x70cc0b8d, "8w4DAE8BYAIThAEAAHUlBa4AAAC5za/NhecSTgw2MQIA8T0uMDAJNy8xNy8xOTQ0RmhYVHViOlpRTjVt"),
    ("reymont", 9): (2111095, 0x3101de38, "8hElUERGLTEuMwozIDAgb2JqIDw8Ci9MZW5ndGggMTUzIAEA8SgKPj4Kc3RyZWFtCjEgMCAwIDEgMjQ0"),
    ("samba", 9): (6139489, 0xf4044d6a, "73NhbWJhLTIuMi4zYS8AAQBD8AAwMDQwNzU1ADAwMDE3NjEIAGYwMTUyADABAP8IADA3NDI3MTA0MDIw"),
    ("sao", 9): (5735258, 0x86580f55, "xAAAAAABAAAAtfMDAAwAAAQA8EUcAAAA1Ke7C7dKOD9rphXawBf3P0Ew0AKZBiK1qpQmMrdL+Jif5EY/"),
    ("webster", 9): (14001448, 0x54c7568d, "8BINClRoZSBQcm9qZWN0IEd1dGVuYmVyZyBFdGV4dCBvZiAfAPCaMTkxMyBXZWJzdGVyIFVuYWJyaWRn"),
    ("x-ray", 9): (7175001, 0x5c516328, "/w/QAQAQB2wItgAQAAEBEQ6zRlNfQS4zMTk3LmltZwABAA9/QkxLTTE4AAEAFlM4MDAxMDEA8w44MC44"),
    ("xml", 9): (770055, 0x4bf9e80d, "n2VsdHMueG1sAAEASOkxMDA3NzUgACAgIDc2NAgA/xAgIDMzNDc1NyAgNzE3NDM2NjM3MCAgMTIyMDEA"),
    ("dickens", 10): (4387799, 0x904e564, "8CMqKlRoZSBQcm9qZWN0IEd1dGVuYmVyZyBFdGV4dCBvZiBBIENoaWxkJ3MgSGlzdG9yeRUA8CJFbmds"),
    ("mozilla", 10): (22104093, 0xbf39f588, "n21vemlsbGEvAAEASOAgNDA3NTUgACAgMjYwMAgANCAgIAgAAw0A/wYgNzQ3NTc0Mjc2MSAgMTA3NjUA"),
    ("mr", 10): (4211991, 0x889040a1, "8CEIAAUACgAAAElTT19JUiAxMDAIAAgAFgAAAE9SSUdJTkFMXFBSSU1BUllcT1RIRVIcAPAKGgAAADEu"),
    ("nci", 10): (3713658, 0x6b055d96, "8BYxNTU1NDIKUk90Y2xzZXJ2ZTExMTUwMDExMjEyRCAwICAgMC4wAQAmICAMAP8EMTA0OTUyMQogCiAz"),
    ("ooffice", 10): (3538803, 0xd556bf8f, "8gNNWpAAAwAAAAQAAAD//wAAuAABAC9AAAEAD/Mu8AAAAA4fug4AtAnNIbgBTM0hVGhpcyBwcm9ncmFt"),
    ("osdb", 10): (3946371, 0x314954b4, "8w4DAE8BYAIThAEAAHUlBa4AAAC5za/NhecSTgw2MQIA8T0uMDAJNy8xNy8xOTQ0RmhYVHViOlpRTjVt"),
    ("reymont", 10): (2090314, 0x12ba7ce5, "8hElUERGLTEuMwozIDAgb2JqIDw8Ci9MZW5ndGggMTUzIAEA8SgKPj4Kc3RyZWFtCjEgMCAwIDEgMjQ0"),
    ("samba", 10): (6111537, 0x502128f3, "73NhbWJhLTIuMi4zYS8AAQBD8AIwMDQwNzU1ADAwMDE3NjEAMAkARjUyADABAP8HADA3NDI3MTA0MDIw"),
    ("sao", 10): (5675760, 0x632caf1b, "xAAAAAABAAAAtfMDAAwAAAQA8EUcAAAA1Ke7C7dKOD9rphXawBf3P0Ew0AKZBiK1qpQmMrdL+Jif5EY/"),
    ("webster", 10): (13874032, 0x4ed55152, "8BINClRoZSBQcm9qZWN0IEd1dGVuYmVyZyBFdGV4dCBvZiAfAPCaMTkxMyBXZWJzdGVyIFVuYWJyaWRn"),
    ("x-ray", 10): (7172973, 0xae97054b, "/w/QAQAQB2wItgAQAAEBEQ6zRlNfQS4zMTk3LmltZwABAA9/QkxLTTE4AAEAFnM4MDAxMDE4DADzDC44"),
    ("xml", 10): (769191, 0xb943ffa7, "n2VsdHMueG1sAAEASOkxMDA3NzUgACAgIDc2NAgA/w8gIDMzNDc1NyAgNzE3NDM2NjM3MCAgMTIyMDEA"),
    ("dickens", 12): (4376097, 0x93fe23ca, "8CMqKlRoZSBQcm9qZWN0IEd1dGVuYmVyZyBFdGV4dCBvZiBBIENoaWxkJ3MgSGlzdG9yeRUA8CJFbmds"),
    ("mozilla", 12): (22014250, 0x13c6d8bf, "n21vemlsbGEvAAEASOAgNDA3NTUgACAgMjYwMAgANCAgIAgAAw0A/wcgNzQ3NTc0Mjc2MSAgMTA3NjUA"),
    ("mr", 12): (4189363, 0x2c54c457, "8CEIAAUACgAAAElTT19JUiAxMDAIAAgAFgAAAE9SSUdJTkFMXFBSSU1BUllcT1RIRVIcAPAKGgAAADEu"),
    ("nci", 12): (3617512, 0x6bdfdff8, "8BYxNTU1NDIKUk90Y2xzZXJ2ZTExMTUwMDExMjEyRCAwICAgMC4wAQAmICAMAP8EMTA0OTUyMQogCiAz"),
    ("ooffice", 12): (3535250, 0xfa843339, "8gNNWpAAAwAAAAQAAAD//wAAuAABAC9AAAEAD/Mu8AAAAA4fug4AtAnNIbgBTM0hVGhpcyBwcm9ncmFt"),
    ("osdb", 12): (3946233, 0xd2c31bce, "8w4DAE8BYAIThAEAAHUlBa4AAAC5za/NhecSTgw2MQIA8T0uMDAJNy8xNy8xOTQ0RmhYVHViOlpRTjVt"),
    ("reymont", 12): (2063052, 0xdc3640ea, "8hElUERGLTEuMwozIDAgb2JqIDw8Ci9MZW5ndGggMTUzIAEA8SgKPj4Kc3RyZWFtCjEgMCAwIDEgMjQ0"),
    ("samba", 12): (6095902, 0x7c2dcd9d, "73NhbWJhLTIuMi4zYS8AAQBD8AIwMDQwNzU1ADAwMDE3NjEAMAkARjUyADABAP8IADA3NDI3MTA0MDIw"),
    ("sao", 12): (5668734, 0x25632994, "xAAAAAABAAAAtfMDAAwAAAQA8EUcAAAA1Ke7C7dKOD9rphXawBf3P0Ew0AKZBiK1qpQmMrdL+Jif5EY/"),
    ("webster", 12): (13823143, 0x1d513e36, "8BINClRoZSBQcm9qZWN0IEd1dGVuYmVyZyBFdGV4dCBvZiAfAPCaMTkxMyBXZWJzdGVyIFVuYWJyaWRn"),
    ("x-ray", 12): (7172970, 0xc4b20f1d, "/w/QAQAQB2wItgAQAAEBEQ6zRlNfQS4zMTk3LmltZwABAA9/QkxLTTE4AAEAFnM4MDAxMDE4DADzDC44"),
    ("xml", 12): (759893, 0xb41feb8f, "n2VsdHMueG1sAAEASOkxMDA3NzUgACAgIDc2NAgA/xAgIDMzNDc1NyAgNzE3NDM2NjM3MCAgMTIyMDEA"),
}


@pytest.mark.parametrize("name", sorted(GOLDEN))
@pytest.mark.parametrize("level", (3, 9, 10, 12))
def test_silesia_golden_checksums_high64(name, level):
    """Size + Adler32-of-compressed + first-60-bytes parity with the
    reference's High64 rows (byte-level fidelity, not just length)."""
    import base64
    import zlib

    data = _load(name)
    size, adler, b64 = GOLDEN_HC64[(name, level)]
    comp = native.encode(data, level)
    assert len(comp) == size, (name, level, len(comp), size)
    assert zlib.adler32(comp) & 0xFFFFFFFF == adler, (name, level)
    assert comp[:60] == base64.b64decode(b64), (name, level)
