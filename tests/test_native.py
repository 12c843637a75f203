"""Native C++ host runtime vs the NumPy golden (differential tests)."""

import numpy as np
import pytest

from fl_rl_compression_mpi_tpu import fileio
from fl_rl_compression_mpi_tpu.native import get_native
from fl_rl_compression_mpi_tpu.ops import fl_numpy, rl_numpy


@pytest.fixture(scope="module")
def nat():
    n = get_native()
    if n is None:
        pytest.skip("native toolchain unavailable")
    return n


def test_fl_matches_golden(nat, fuzz_inputs):
    for data in fuzz_inputs:
        bits_g, values_g = fl_numpy.encode(data)
        bits_n, values_n = nat.fl_encode(data)
        np.testing.assert_array_equal(bits_n, bits_g)
        np.testing.assert_array_equal(values_n, values_g)
        out = nat.fl_decode(data.size, bits_n, values_n)
        np.testing.assert_array_equal(out, data)


def test_rl_matches_golden(nat, fuzz_inputs):
    for data in fuzz_inputs:
        c_g, v_g = rl_numpy.encode(data)
        c_n, v_n = nat.rl_encode(data)
        np.testing.assert_array_equal(c_n, c_g)
        np.testing.assert_array_equal(v_n, v_g)
        np.testing.assert_array_equal(nat.rl_decode(c_n, v_n), data)


def test_fl_sample_bmp(nat, sample_bmp):
    bits_g, values_g = fl_numpy.encode(sample_bmp)
    bits_n, values_n = nat.fl_encode(sample_bmp)
    np.testing.assert_array_equal(bits_n, bits_g)
    np.testing.assert_array_equal(values_n, values_g)
    np.testing.assert_array_equal(
        nat.fl_decode(sample_bmp.size, bits_n, values_n), sample_bmp)


def test_file_io_roundtrip(nat, tmp_path):
    g = np.random.default_rng(0)
    data = g.integers(0, 256, 100_003, np.uint8)
    p = str(tmp_path / "blob.bin")
    nat.write_file(p, data)
    np.testing.assert_array_equal(nat.read_file(p), data)
    np.testing.assert_array_equal(fileio.load_file(p), data)
    np.testing.assert_array_equal(nat.read_range(p, 1000, 512),
                                  data[1000:1512])


def test_sharded_read_matches_reference_split(nat, tmp_path):
    g = np.random.default_rng(1)
    data = g.integers(0, 256, 128 * 1000 + 77, np.uint8)
    p = str(tmp_path / "blob.bin")
    data.tofile(p)
    got = []
    for i in range(4):
        chunk, off = fileio.load_file_sharded(p, i, 4)
        assert off == i * (data.size // (128 * 4)) * 128
        if i < 3:
            assert chunk.size % 128 == 0
        got.append(chunk)
    np.testing.assert_array_equal(np.concatenate(got), data)


def test_container_write_native(nat, tmp_path):
    from fl_rl_compression_mpi_tpu import container
    g = np.random.default_rng(2)
    data = g.integers(0, 8, 10_000, np.uint8)
    bits, values = fl_numpy.encode(data)
    p1, p2 = str(tmp_path / "a.fl"), str(tmp_path / "b.fl")
    container.save_fl(p1, container.FLCompressed(bits, values, data.size))
    nat.write_container(p2, data.size, bits, values)
    assert open(p1, "rb").read() == open(p2, "rb").read()
