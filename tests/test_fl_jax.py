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


def test_fl_host_constant_closed_form_all_widths():
    """Round-4b host constant fast path: the FL container of a constant
    stream is closed-form for EVERY width (odd included) and any tail;
    near-constant streams fall through; a corrupt last payload byte is
    rejected by the exact compare."""
    from fl_rl_compression_mpi_tpu.ops import fl_jax, fl_numpy
    for c in (0, 1, 5, 9, 37, 255):
        for n in (1, 127, 128, 129, 12801):
            data = np.full(n, c, np.uint8)
            bg, vg = fl_numpy.encode(data)
            b, v = fl_jax.encode(data)
            np.testing.assert_array_equal(b, bg, err_msg=f"c={c} n={n}")
            np.testing.assert_array_equal(v, vg, err_msg=f"c={c} n={n}")
            np.testing.assert_array_equal(fl_jax.decode(n, b, v), data)
    d = np.full(200_000, 9, np.uint8)
    d[-3] = 8
    bg, vg = fl_numpy.encode(d)
    b, v = fl_jax.encode(d)
    np.testing.assert_array_equal(b, bg)
    np.testing.assert_array_equal(v, vg)
    np.testing.assert_array_equal(fl_jax.decode(d.size, b, v), d)
    d2 = np.full(130_000, 5, np.uint8)
    b2, v2 = fl_numpy.encode(d2)
    v2c = v2.copy()
    v2c[-1] ^= 1
    assert not np.array_equal(fl_jax.decode(d2.size, b2, v2c), d2)


def test_constant_probe_chunked_early_exit():
    """Shared chunked constant probe (ADVICE r4): bounded-memory verify
    with early exit; mismatches at chunk boundaries and deep into the
    stream are caught; empty input is None."""
    from fl_rl_compression_mpi_tpu.utils import constant_byte_probe
    assert constant_byte_probe(np.zeros(0, np.uint8)) is None
    assert constant_byte_probe(np.full(100, 7, np.uint8)) == 7
    # crosses the 128 KiB probe and several 8 MiB chunks
    a = np.full(20 << 20, 3, np.uint8)
    assert constant_byte_probe(a) == 3
    for pos in (0, (128 << 10) - 1, 128 << 10, (8 << 20) + (128 << 10),
                (20 << 20) - 1):
        b = a.copy()
        b[pos] = 9
        assert constant_byte_probe(b) is None, pos
    # the FL and RL host codecs both dispatch through it
    from fl_rl_compression_mpi_tpu.ops import fl_jax, rl_jax
    assert fl_jax._host_constant_byte(np.full(10, 4, np.uint8)) == 4
    assert rl_jax._constant_byte(np.full(10, 4, np.uint8)) == 4


def test_fl_encode_rejects_unaligned_frame_length():
    """frame_length % 8 != 0 must raise at the API boundary (ADVICE r4:
    the closed-form constant encode would otherwise silently emit a
    wrong container for constant inputs)."""
    import pytest
    from fl_rl_compression_mpi_tpu.ops import fl_jax
    const = np.full(1000, 5, np.uint8)   # would hit the constant path
    with pytest.raises(ValueError, match="multiple of 8"):
        fl_jax.encode(const, frame_length=100)
    with pytest.raises(ValueError, match="multiple of 8"):
        fl_jax.decode(100, np.ones(1, np.uint8), np.ones(13, np.uint8),
                      frame_length=100)


def test_w8_identity_decode_fast_path():
    """Round-5: an all-8 widths header means the payload IS the output
    (width-8 packing is the identity) — the host decode returns one
    memcpy with no device work, byte-exact with the golden decoder."""
    from fl_rl_compression_mpi_tpu.ops import fl_jax, fl_numpy
    rng = np.random.default_rng(8)
    for n in (128 * 64, 128 * 64 + 77):
        data = rng.integers(0, 256, n, np.uint8)
        data[::128] |= 128          # pin every frame at width 8
        bits, values = fl_numpy.encode(data)
        assert int(bits.max()) == 8 and int(bits.min()) == 8
        np.testing.assert_array_equal(fl_jax.decode(n, bits, values),
                                      data)
        from fl_rl_compression_mpi_tpu.parallel import dist
        comp = dist.FLCompressed(bits, values, n)
        np.testing.assert_array_equal(
            dist.decompress_fl(comp, dist.make_mesh(2)), data)
