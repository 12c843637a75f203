"""JAX device FL codec vs the NumPy golden (differential oracle tests).

Runs on the virtual CPU backend (see conftest).  The golden itself is pinned
to the reference semantics by test_fl_numpy / test_container, so agreement
here transitively pins the device path to the reference container format.
"""

import numpy as np
import pytest

from fl_rl_compression_mpi_tpu.ops import fl_jax, fl_numpy


def _check_roundtrip(data):
    bits_g, values_g = fl_numpy.encode(data)
    bits_d, values_d = fl_jax.encode(data, bucket_frames=16)
    np.testing.assert_array_equal(bits_d, bits_g)
    np.testing.assert_array_equal(values_d, values_g)
    out = fl_jax.decode(data.size, bits_d, values_d, bucket_frames=16)
    np.testing.assert_array_equal(out, data)


def test_fuzz_battery_matches_golden(fuzz_inputs):
    for data in fuzz_inputs:
        _check_roundtrip(data)


def test_random_large():
    g = np.random.default_rng(7)
    for size in (1, 127, 128, 129, 128 * 1000 + 77, 1 << 18):
        for hi in (2, 16, 256):
            data = g.integers(0, hi, size, np.uint8)
            _check_roundtrip(data)


def test_sample_bmp_roundtrip(sample_bmp):
    bits_g, values_g = fl_numpy.encode(sample_bmp)
    bits_d, values_d = fl_jax.encode(sample_bmp)
    np.testing.assert_array_equal(bits_d, bits_g)
    np.testing.assert_array_equal(values_d, values_g)
    out = fl_jax.decode(sample_bmp.size, bits_d, values_d)
    np.testing.assert_array_equal(out, sample_bmp)


def test_cross_decode():
    """Golden-encoded streams decode on device and vice versa."""
    g = np.random.default_rng(3)
    data = g.integers(0, 32, 5000, np.uint8)
    bits_g, values_g = fl_numpy.encode(data)
    np.testing.assert_array_equal(
        fl_jax.decode(data.size, bits_g, values_g, bucket_frames=16), data)
    bits_d, values_d = fl_jax.encode(data, bucket_frames=16)
    np.testing.assert_array_equal(
        fl_numpy.decode(data.size, bits_d, values_d), data)


@pytest.mark.parametrize("frame_length", [8, 64, 256])
def test_configurable_frame_length(frame_length):
    g = np.random.default_rng(11)
    data = g.integers(0, 64, 3 * frame_length + 5, np.uint8)
    bits_g, values_g = fl_numpy.encode(data, frame_length)
    bits_d, values_d = fl_jax.encode(data, frame_length, bucket_frames=4)
    np.testing.assert_array_equal(bits_d, bits_g)
    np.testing.assert_array_equal(values_d, values_g)
    out = fl_jax.decode(data.size, bits_d, values_d, frame_length,
                        bucket_frames=4)
    np.testing.assert_array_equal(out, data)
