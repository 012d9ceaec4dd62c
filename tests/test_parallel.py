"""Block-parallel sharding tests on the 8-virtual-device CPU mesh: the
single-chip and sharded multi-device paths must produce identical bytes
(the analog of the reference's 32/64-bit dual-engine equivalence tests,
SURVEY.md §4 implication iv)."""

import numpy as np
import pytest

import jax

from lz4_tpu.parallel import blocks as pb


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return pb.make_mesh(jax.devices()[:8])


def test_encode_blocks_sharded_equals_single(mesh, lorem, rng):
    data = lorem(200_000, rng)
    single = pb.encode_blocks(data, block_size=16384, level=0)
    sharded = pb.encode_blocks(data, block_size=16384, level=0, mesh=mesh)
    assert single == sharded


def test_roundtrip_sharded(mesh, lorem, rng):
    data = lorem(150_000, rng)
    comp = pb.encode_blocks(data, block_size=16384, mesh=mesh)
    out = pb.decode_blocks(comp, 16384, total_length=len(data), mesh=mesh)
    assert out == data


def test_roundtrip_unsharded(lorem, rng):
    data = lorem(60_000, rng)
    comp = pb.encode_blocks(data, block_size=8192)
    assert pb.decode_blocks(comp, 8192, total_length=len(data)) == data


def test_uneven_tail_block(rng):
    data = bytes(rng.choice(b"xyz") for _ in range(10_000))
    comp = pb.encode_blocks(data, block_size=4096)
    assert pb.decode_blocks(comp, 4096) == data


def test_batch_padding_not_multiple_of_devices(mesh, lorem, rng):
    # 3 real blocks over 8 devices: padding rows must not corrupt output
    data = lorem(40_000, rng)
    comp = pb.encode_blocks(data, block_size=16384, mesh=mesh)
    assert len(comp) == 3
    assert pb.decode_blocks(comp, 16384, mesh=mesh) == data


def test_decode_error_surfaces(mesh):
    from lz4_tpu.block.hostref import LZ4Error

    # token: 1 literal then a match at offset 0 (invalid per format)
    bad = [b"\x10a\x00\x00\x00"]
    with pytest.raises(LZ4Error):
        pb.decode_blocks(bad, 4096)
