"""Pack-2 field kernels (global max width <= 4) vs the base kernels.

Runs in interpret mode on CPU (tests/conftest.py); tile_r comes from
FLRL_TILE_R=256, so the pack layout unit is 256 rows here.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fl_rl_compression_mpi_tpu.ops import fl_pallas

TR = fl_pallas.PACK_TILE_R
TW = TR * fl_pallas.LANES          # pack-tile granularity (words)


def _prep(data):
    n = data.size
    nw = fl_pallas.pad_words(n, TW)
    buf = np.zeros(nw * 4, np.uint8)
    buf[:n] = data
    return jnp.asarray(buf.view(np.uint32)), n


@pytest.mark.parametrize("seed,size,hi", [
    (0, 4 * TW * 4, 16),           # w=4 everywhere (the benchmark shape)
    (1, 4 * TW * 4 - 77, 16),      # tail frame
    (2, TW * 4 + 1, 2),            # w=1
    (3, 1, 4),                     # single byte
    (4, 130_000, 9),               # mixed widths 1..4
])
def test_packed_matches_base(seed, size, hi):
    data = np.random.default_rng(seed).integers(0, hi, size, np.uint8)
    words, n = _prep(data)
    b_p, packed = fl_pallas.fl_encode_fields_packed_pallas(
        words, jnp.int32(n))
    b_b, fields = fl_pallas.fl_encode_fields_pallas(words, jnp.int32(n),
                                                    tile_r=TR)
    nw = words.shape[0]
    np.testing.assert_array_equal(
        np.asarray(b_p).reshape(-1), np.asarray(b_b).reshape(-1))
    assert int(np.asarray(b_p).max()) <= 4      # contract precondition
    np.testing.assert_array_equal(
        fl_pallas.unpack_fields_p2(np.asarray(packed), nw),
        np.asarray(fields))


@pytest.mark.parametrize("seed,size,hi", [
    (5, 4 * TW * 4 - 3, 16), (6, 999, 16), (7, 2 * TW * 4, 3),
])
def test_packed_roundtrip(seed, size, hi):
    data = np.random.default_rng(seed).integers(0, hi, size, np.uint8)
    words, n = _prep(data)
    b_p, packed = fl_pallas.fl_encode_fields_packed_pallas(
        words, jnp.int32(n))
    out = fl_pallas.fl_decode_fields_packed_pallas(packed, b_p,
                                                   jnp.int32(n))
    np.testing.assert_array_equal(
        np.asarray(out).view(np.uint8)[:n], data)


def test_wide_frames_detected_by_widths():
    """Width->4 data is the caller's fallback case: the widths output
    (always correct) must reveal it so the speculative caller can
    discard the packed fields."""
    data = np.random.default_rng(8).integers(0, 256, 4 * TW, np.uint8)
    data[0] = 255
    words, n = _prep(data)
    b_p, _ = fl_pallas.fl_encode_fields_packed_pallas(words, jnp.int32(n))
    assert int(np.asarray(b_p).max()) > 4
