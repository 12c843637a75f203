"""Pallas-kernel plumbing through shard_map, exercised on CPU.

The TPU-only kernel selection means ordinary CPU tests cover the XLA
kernels inside `shard_map`; here we force the Pallas path (interpret mode)
to pin the rank-3 widths plumbing (bits2d per shard) end to end.
"""

import numpy as np
import pytest

from fl_rl_compression_mpi_tpu.ops import fl_jax, fl_numpy
from fl_rl_compression_mpi_tpu.parallel import dist


@pytest.fixture
def force_pallas(monkeypatch):
    from fl_rl_compression_mpi_tpu.ops import fl_pallas

    def use(frame_length, nw):
        return (fl_pallas._supported(frame_length)
                and nw % fl_pallas.TILE_WORDS == 0)

    monkeypatch.setattr(fl_jax, "_use_pallas", use)
    return use


def test_compress_fl_pallas_in_shard_map(force_pallas):
    from fl_rl_compression_mpi_tpu.ops.fl_pallas import TILE_WORDS
    mesh = dist.make_mesh()
    n_dev = mesh.devices.size
    # per-shard words must be a tile multiple for the pallas path
    bucket_frames = TILE_WORDS // 32
    data = np.random.default_rng(0).integers(
        0, 64, 128 * bucket_frames * n_dev + 999, np.uint8)
    comp = dist.compress_fl(data, mesh, bucket_frames=bucket_frames)
    bits_g, values_g = fl_numpy.encode(data)
    np.testing.assert_array_equal(comp.bits, bits_g)
    np.testing.assert_array_equal(comp.values, values_g)
    out = dist.decompress_fl(comp, mesh, bucket_frames=bucket_frames)
    np.testing.assert_array_equal(out, data)


def test_compress_fl_ici_pallas(force_pallas):
    from fl_rl_compression_mpi_tpu.ops.fl_pallas import TILE_WORDS
    mesh = dist.make_mesh(2)
    bucket_frames = TILE_WORDS // 32
    data = np.random.default_rng(1).integers(
        0, 16, 128 * bucket_frames * 2 + 7, np.uint8)
    comp = dist.compress_fl_ici(data, mesh, bucket_frames=bucket_frames)
    bits_g, values_g = fl_numpy.encode(data)
    np.testing.assert_array_equal(comp.bits, bits_g)
    np.testing.assert_array_equal(comp.values, values_g)
