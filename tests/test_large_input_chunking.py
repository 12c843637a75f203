"""Oversized-input auto-chunking (VERDICT r1 weak #5).

Inputs beyond the int32 device cap are processed in frame-aligned chunks
with byte-identical output (finding #3: frame-aligned splits concatenate
losslessly).  The reference instead overflows its ``int`` chunk math past
2 GB (``file_io.cu:46-51``).  Here the cap is monkeypatched small so the
chunked code path runs on test-sized data; the full 3,124 MB configs run
on the real chip via ``scripts/bench_matrix.py``.
"""

import numpy as np
import pytest

from fl_rl_compression_mpi_tpu import container
from fl_rl_compression_mpi_tpu.ops import fl_jax, fl_numpy
from fl_rl_compression_mpi_tpu.parallel import dist


@pytest.fixture
def small_cap(monkeypatch):
    monkeypatch.setattr(fl_jax, "MAX_DEVICE_CHUNK", 1 << 16)


def _data(n=500_000, seed=7):
    return np.random.default_rng(seed).integers(0, 200, n, np.uint8)


def test_single_chip_encode_chunked_bit_exact(small_cap):
    data = _data()
    bits, values = fl_jax.encode(data)
    bg, vg = fl_numpy.encode(data)
    np.testing.assert_array_equal(bits, bg)
    np.testing.assert_array_equal(values, vg)
    np.testing.assert_array_equal(
        fl_jax.decode(data.size, bits, values), data)


def test_single_chip_decode_chunked_tail_frame(small_cap):
    data = _data(300_001)   # forces a partial tail frame in the last chunk
    bits, values = fl_numpy.encode(data)
    np.testing.assert_array_equal(
        fl_jax.decode(data.size, bits, values), data)


def test_dist_superchunk_bit_exact(small_cap):
    data = _data(1_000_000)
    mesh = dist.make_mesh()
    comp = dist.compress_fl(data, mesh)
    bg, vg = fl_numpy.encode(data)
    np.testing.assert_array_equal(comp.bits, bg)
    np.testing.assert_array_equal(comp.values, vg)
    np.testing.assert_array_equal(dist.decompress_fl(comp, mesh), data)


def test_dist_ici_superchunk_bit_exact(small_cap):
    data = _data(700_000, seed=9)
    mesh = dist.make_mesh()
    comp = dist.compress_fl_ici(data, mesh)
    bg, vg = fl_numpy.encode(data)
    np.testing.assert_array_equal(comp.bits, bg)
    np.testing.assert_array_equal(comp.values, vg)


def test_container_roundtrip_through_files(small_cap, tmp_path):
    data = _data(400_000, seed=11)
    bits, values = fl_jax.encode(data)
    p = str(tmp_path / "big.fl")
    container.save_fl(p, container.FLCompressed(bits, values, data.size))
    c = container.load_fl(p)
    np.testing.assert_array_equal(
        fl_jax.decode(c.input_size, c.bits, c.values), data)
