"""JAX device RL codec vs the NumPy golden (differential oracle tests)."""

import numpy as np

from fl_rl_compression_mpi_tpu.ops import rl_jax, rl_numpy


def _check_roundtrip(data):
    counts_g, values_g = rl_numpy.encode(data)
    counts_d, values_d = rl_jax.encode(data, bucket=256)
    np.testing.assert_array_equal(counts_d, counts_g)
    np.testing.assert_array_equal(values_d, values_g)
    out = rl_jax.decode(counts_d, values_d, bucket=256)
    np.testing.assert_array_equal(out, data)


def test_fuzz_battery_matches_golden(fuzz_inputs):
    for data in fuzz_inputs:
        _check_roundtrip(data)


def test_run_cap_boundaries():
    for size in (254, 255, 256, 510, 511, 765, 1000):
        _check_roundtrip(np.full(size, 9, np.uint8))


def test_degenerate_extremes():
    g = np.random.default_rng(5)
    # no runs: strictly alternating bytes
    _check_roundtrip(np.tile(np.array([1, 2], np.uint8), 2000))
    # all one run (long, straddles many caps)
    _check_roundtrip(np.zeros(100_000, np.uint8))
    # random run lengths
    _check_roundtrip(np.repeat(g.integers(0, 256, 500, np.uint8),
                               g.integers(1, 700, 500)))


def test_sample_bmp_roundtrip(sample_bmp):
    counts_g, values_g = rl_numpy.encode(sample_bmp)
    counts_d, values_d = rl_jax.encode(sample_bmp)
    np.testing.assert_array_equal(counts_d, counts_g)
    np.testing.assert_array_equal(values_d, values_g)
    out = rl_jax.decode(counts_d, values_d)
    np.testing.assert_array_equal(out, sample_bmp)


def test_constant_stream_fast_path_bit_exact():
    """Round-4b whole-stream constant fast path: the closed-form
    container must equal the golden, both directions, including the
    255-cap tail."""
    from fl_rl_compression_mpi_tpu.ops import rl_numpy
    for c, n in ((0, 255 * 300 + 17), (0, 255), (7, 255 * 4),
                 (200, 1), (9, 256)):
        data = np.full(n, c, np.uint8)
        cg, vg = rl_numpy.encode(data)
        cd, vd = rl_jax.encode(data)
        np.testing.assert_array_equal(cd, cg, err_msg=f"c={c} n={n}")
        np.testing.assert_array_equal(vd, vg, err_msg=f"c={c} n={n}")
        np.testing.assert_array_equal(rl_jax.decode(cd, vd), data)


def test_constant_probe_miss_takes_device_path():
    """A stream whose FIRST 128 KiB is constant but that later differs
    must fall through to the device path and stay exact."""
    from fl_rl_compression_mpi_tpu.ops import rl_numpy
    data = np.zeros(200 << 10, np.uint8)
    data[-5] = 3
    cg, vg = rl_numpy.encode(data)
    cd, vd = rl_jax.encode(data)
    np.testing.assert_array_equal(cd, cg)
    np.testing.assert_array_equal(vd, vg)
    np.testing.assert_array_equal(rl_jax.decode(cd, vd), data)
    # non-canonical constant-value container (counts not all 255) still
    # decodes exactly through whichever path serves it
    counts = np.array([3, 255, 7], np.uint8)
    values = np.array([5, 5, 5], np.uint8)
    np.testing.assert_array_equal(
        rl_jax.decode(counts, values), np.full(265, 5, np.uint8))
