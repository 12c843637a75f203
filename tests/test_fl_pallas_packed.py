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


def test_encode_chunks_pack2_speculation(monkeypatch):
    """Round-5 review fix: the pipelined encode keeps the pack-2 fields
    speculation (it had been dropped vs the serial path) — hit on a
    w<=4 chunk, drain-time base-kernel re-run on a w8 chunk, both
    byte-exact."""
    from fl_rl_compression_mpi_tpu.ops import fl_jax, fl_numpy
    monkeypatch.setattr(
        fl_jax, "_use_pallas",
        lambda fl_len, nw: fl_len == 128 and nw % (TR * 128) == 0)
    calls = {"p2": 0}
    orig = fl_pallas.fl_encode_fields_packed_pallas

    def spy(*a, **k):
        calls["p2"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(fl_pallas, "fl_encode_fields_packed_pallas", spy)
    rng = np.random.default_rng(31)
    bucket = TR * 4             # npad//4 must be a (TR*128)-word multiple
    hit = rng.integers(0, 16, 128 * bucket, np.uint8)
    miss = rng.integers(0, 256, 128 * bucket, np.uint8)
    miss[::64] |= 128
    data = np.concatenate([hit, miss])
    parts = list(fl_jax.encode_chunks(iter([hit, miss]),
                                      bucket_frames=bucket))
    assert calls["p2"] >= 2                  # speculated on both
    bg, vg = fl_numpy.encode(data)
    np.testing.assert_array_equal(
        np.concatenate([p[0] for p in parts]), bg)
    np.testing.assert_array_equal(
        np.concatenate([p[1] for p in parts]), vg)
