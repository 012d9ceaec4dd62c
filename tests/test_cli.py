"""CLI tests (component #31, RoundtripApp analog): compress/decompress/
roundtrip/pickle through the argparse entry point in-process."""

import os

import pytest

from lz4_tpu.cli import main


@pytest.fixture
def sample_file(tmp_path, lorem, rng):
    p = tmp_path / "sample.txt"
    p.write_bytes(lorem(50_000, rng))
    return p


def test_compress_decompress(tmp_path, sample_file):
    out = tmp_path / "s.lz4"
    back = tmp_path / "s.out"
    assert main(["compress", "--backend", "host", str(sample_file), str(out)]) == 0
    assert out.exists() and out.stat().st_size < sample_file.stat().st_size
    assert main(["decompress", "--backend", "host", str(out), str(back)]) == 0
    assert back.read_bytes() == sample_file.read_bytes()


def test_compress_options(tmp_path, sample_file):
    out = tmp_path / "o.lz4"
    assert (
        main(
            [
                "compress", "--backend", "host", "-l", "9", "-B", "5", "-BD",
                "-BX", "--store-size", "-T", "0",
                str(sample_file), str(out),
            ]
        )
        == 0
    )
    back = tmp_path / "o.out"
    assert main(["decompress", "--backend", "host", str(out), str(back)]) == 0
    assert back.read_bytes() == sample_file.read_bytes()


def test_roundtrip_command(sample_file, capsys):
    assert main(["roundtrip", "--backend", "host", str(sample_file)]) == 0
    assert "OK" in capsys.readouterr().out


def test_pickle_unpickle(tmp_path, sample_file):
    blob = tmp_path / "p.bin"
    back = tmp_path / "p.out"
    assert main(["pickle", "-l", "9", str(sample_file), str(blob)]) == 0
    assert main(["unpickle", str(blob), str(back)]) == 0
    assert back.read_bytes() == sample_file.read_bytes()


def test_default_output_name(tmp_path, sample_file, monkeypatch):
    monkeypatch.chdir(tmp_path)
    assert main(["compress", "--backend", "host", str(sample_file)]) == 0
    assert os.path.exists(str(sample_file) + ".lz4")
