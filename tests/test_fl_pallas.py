"""Pallas field kernels vs the XLA field kernels (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fl_rl_compression_mpi_tpu.ops import fl_jax, fl_pallas

TW = fl_pallas.TILE_WORDS


def _prep(data):
    n = data.size
    nw = fl_pallas.pad_words(n)
    buf = np.zeros(nw * 4, np.uint8)
    buf[:n] = data
    return jnp.asarray(buf.view(np.uint32)), n


@pytest.mark.parametrize("seed,size,hi", [
    (0, 4 * TW, 256), (1, 4 * TW - 77, 16), (2, TW + 1, 2),
    (3, 1, 256), (4, 130_000, 64),
])
def test_encode_matches_xla(seed, size, hi):
    data = np.random.default_rng(seed).integers(0, hi, size, np.uint8)
    words, n = _prep(data)
    bits_p, fields_p = fl_pallas.fl_encode_fields_pallas(words, jnp.int32(n))
    bits_x, fields_x = fl_jax.fl_encode_fields(words, jnp.int32(n))
    frames = -(-n // 128)
    np.testing.assert_array_equal(
        np.asarray(bits_p).reshape(-1)[:frames],
        np.asarray(bits_x)[:frames])
    nwv = -(-n // 4)
    np.testing.assert_array_equal(np.asarray(fields_p)[:nwv],
                                  np.asarray(fields_x)[:nwv])


@pytest.mark.parametrize("seed,size,hi", [(5, 4 * TW - 3, 32), (6, 999, 256)])
def test_decode_roundtrip(seed, size, hi):
    data = np.random.default_rng(seed).integers(0, hi, size, np.uint8)
    words, n = _prep(data)
    # Encode's (rows, fpr) widths output is exactly decode's input shape.
    bits_p, fields_p = fl_pallas.fl_encode_fields_pallas(words, jnp.int32(n))
    out = fl_pallas.fl_decode_fields_pallas(fields_p, bits_p, jnp.int32(n))
    np.testing.assert_array_equal(
        np.asarray(out).view(np.uint8)[:n], data)


def test_zero_and_uniform():
    for data in (np.zeros(TW * 4, np.uint8), np.full(TW * 4, 255, np.uint8)):
        words, n = _prep(data)
        bits_p, fields_p = fl_pallas.fl_encode_fields_pallas(
            words, jnp.int32(n))
        out = fl_pallas.fl_decode_fields_pallas(fields_p, bits_p,
                                                jnp.int32(n))
        np.testing.assert_array_equal(
            np.asarray(out).view(np.uint8)[:n], data)
