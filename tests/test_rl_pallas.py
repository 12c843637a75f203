"""Pallas RL kernels vs the NumPy golden (interpret mode on CPU).

Covers the adversarial shapes the routing design must survive: the
255-run cap, runs straddling tile boundaries, dense length-1 runs (max
compaction load), a single input-length run (max carry load), exact-tile
sizes, and sub-tile tails.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fl_rl_compression_mpi_tpu.ops import rl_jax, rl_numpy, rl_pallas

# Heavy interpret-mode / multi-process suite: slow tier (see conftest).
pytestmark = pytest.mark.slow

R = 64   # tile rows under test (8192-byte tiles)
SUB = 32  # sub-tile rows: 2 routing passes per tile (the multi-sub merge
# path that production R=512/sub=256 and R=256/sub=128 rely on)


def _encode(data, sub=SUB):
    n = data.size
    tile = R * 128
    npad = max(tile, -(-n // tile) * tile)
    buf = np.zeros(npad, np.uint8)
    buf[:n] = data
    packed, total = rl_pallas.rl_encode_pallas(
        jnp.asarray(buf.reshape(-1, 128)), jnp.int32(n), tile_rows=R,
        sub_rows=sub)
    counts, values = rl_pallas.rl_split_packed(packed, total,
                                               jnp.int32(n))
    total = int(total)
    return np.asarray(counts)[:total], np.asarray(values)[:total]


def _decode(counts, values, n, sub=SUB, win=True):
    tile = R * 128
    rows_out = max(R, -(-n // tile) * R)
    rcap = -(-max(1, counts.size) // 128) * 128
    cbuf = np.zeros(rcap, np.uint8)
    cbuf[:counts.size] = counts
    vbuf = np.zeros(rcap, np.uint8)
    vbuf[:values.size] = values
    wr = rl_pallas.decode_window_rows(counts, rows_out, R) if win else None
    out = rl_pallas.rl_decode_pallas(
        jnp.asarray(cbuf), jnp.asarray(vbuf), jnp.int32(counts.size),
        rows_out, tile_rows=R, sub_rows=sub, win_rows=wr)
    return np.asarray(out).reshape(-1)[:n]


def _cases():
    g = np.random.default_rng(0)
    return [
        ("few-runs", g.integers(0, 4, 10_000, np.uint8)),
        ("cap-runs", np.repeat(g.integers(0, 8, 100, np.uint8),
                               300)[:20_000].copy()),
        ("dense", g.integers(0, 256, 9_000, np.uint8)),
        ("one-run", np.zeros(30_000, np.uint8)),
        ("exact-tile", np.full(R * 128, 7, np.uint8)),
        ("ramp", np.arange(256, dtype=np.uint8).repeat(97)[:17_000].copy()),
        ("tiny", g.integers(0, 2, 131).astype(np.uint8)),
        ("cap-boundary-255", np.full(255, 9, np.uint8)),
        ("cap-boundary-256", np.full(256, 9, np.uint8)),
        ("tile-straddle", np.repeat(
            g.integers(0, 16, 40, np.uint8), 500)[:R * 128 * 2 + 5].copy()),
        # constant-tile fast-path transitions (the encoder branch-skips
        # its scan/route pipeline on tiles with no run start): nonzero
        # constant spanning whole tiles between varying regions, both
        # re-entry orders, and an n-cut inside a constant tile
        ("const-mid", np.concatenate([
            g.integers(0, 9, 700, np.uint8),
            np.full(3 * R * 128, 42, np.uint8),
            g.integers(0, 9, 900, np.uint8),
            np.full(2 * R * 128, 42, np.uint8)])),
        ("const-head-cut", np.full(2 * R * 128 + 77, 200, np.uint8)),
        ("const-zero-cut", np.zeros(R * 128 + 254, np.uint8)),
        ("const-alt", np.concatenate([
            np.full(R * 128, v, np.uint8) for v in (5, 5, 6, 6, 6, 7)])),
    ]


@pytest.mark.parametrize("sub", [R, SUB, 16], ids=["sub1", "sub2", "sub4"])
@pytest.mark.parametrize("name,data", _cases(),
                         ids=[c[0] for c in _cases()])
def test_encode_matches_golden(name, data, sub):
    counts, values = _encode(data, sub)
    cg, vg = rl_numpy.encode(data)
    np.testing.assert_array_equal(counts, cg)
    np.testing.assert_array_equal(values, vg)


@pytest.mark.parametrize("sub", [R, SUB, 16], ids=["sub1", "sub2", "sub4"])
@pytest.mark.parametrize("name,data", _cases(),
                         ids=[c[0] for c in _cases()])
def test_decode_roundtrip(name, data, sub):
    cg, vg = rl_numpy.encode(data)
    np.testing.assert_array_equal(_decode(cg, vg, data.size, sub), data)


@pytest.mark.parametrize("name,data", _cases(),
                         ids=[c[0] for c in _cases()])
def test_decode_worst_case_window(name, data):
    """Default (no hint) window = R+8 worst case stays correct."""
    cg, vg = rl_numpy.encode(data)
    np.testing.assert_array_equal(
        _decode(cg, vg, data.size, win=False), data)


@pytest.mark.parametrize("name,data", _cases(),
                         ids=[c[0] for c in _cases()])
def test_decode_packed_roundtrip(name, data):
    """Packed-stream decode (no counts/values split) matches the input —
    the device-to-device pipeline path bench.py's rl_pair uses."""
    n = data.size
    tile = R * 128
    npad = max(tile, -(-n // tile) * tile)
    buf = np.zeros(npad, np.uint8)
    buf[:n] = data
    packed, total = rl_pallas.rl_encode_pallas(
        jnp.asarray(buf.reshape(-1, 128)), jnp.int32(n), tile_rows=R,
        sub_rows=SUB)
    out = rl_pallas.rl_decode_packed_pallas(
        packed, total, npad // 128, tile_rows=R, sub_rows=SUB)
    np.testing.assert_array_equal(np.asarray(out).reshape(-1)[:n], data)


def test_decode_window_rows_bounds():
    """The hint covers the densest tile exactly: 1-byte runs demand the
    full worst-case window; long runs collapse it to the minimum."""
    dense = np.arange(256, dtype=np.uint8)[
        np.random.default_rng(0).integers(0, 256, R * 128 * 2)]
    cg, _ = rl_numpy.encode(dense)
    assert rl_pallas.decode_window_rows(cg, 2 * R, R) == R + 8
    cg2, _ = rl_numpy.encode(np.zeros(R * 128 * 4, np.uint8))
    assert rl_pallas.decode_window_rows(cg2, 4 * R, R) == 16


def test_device_dispatch_wrappers(fuzz_inputs):
    """The rl_jax host wrappers (XLA fallback on CPU) stay bit-identical
    with the golden across the fuzz battery after the dispatch refactor."""
    for data in fuzz_inputs:
        c, v = rl_jax.encode(data)
        cg, vg = rl_numpy.encode(data)
        np.testing.assert_array_equal(c, cg)
        np.testing.assert_array_equal(v, vg)
        np.testing.assert_array_equal(rl_jax.decode(cg, vg),
                                      rl_numpy.decode(cg, vg))


@pytest.mark.timeout(600)
def test_rl_wide_tiles_roundtrip():
    """Round-4 WIDE two-array networks in the RL kernels: a single
    R=512-row sub-tile (> 2^15 elements — the old cap) replaces the
    per-sub merge machinery; parity vs the NumPy golden on long-run,
    short-run, cap-straddling and constant streams, both directions."""
    import jax

    from fl_rl_compression_mpi_tpu.ops import rl_numpy
    g = np.random.default_rng(77)
    R = 512
    rows = R * 2
    n = rows * 128 - 13
    streams = {
        "long-run": np.resize(np.repeat(
            g.integers(0, 256, n // 40 + 2, np.uint8),
            g.integers(20, 60, n // 40 + 2)), n),
        "short-run": np.resize(np.repeat(
            g.integers(0, 256, n // 3 + 2, np.uint8),
            g.integers(1, 5, n // 3 + 2)), n),
        "cap-straddle": np.resize(np.repeat(
            g.integers(0, 256, n // 700 + 2, np.uint8),
            g.integers(500, 900, n // 700 + 2)), n),
        "zeros": np.zeros(n, np.uint8),
    }
    for name, data in streams.items():
        data = np.ascontiguousarray(data[:n])
        buf = np.zeros((rows, 128), np.uint8)
        buf.reshape(-1)[:n] = data
        packed, total = rl_pallas.rl_encode_pallas(
            jnp.asarray(buf), jnp.int32(n), tile_rows=R, sub_rows=R)
        cg, vg = rl_numpy.encode(data)
        r = int(jax.device_get(total))
        assert r == cg.size, (name, r, cg.size)
        c_d, v_d = rl_pallas.rl_split_packed(packed, total, jnp.int32(n))
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(c_d))[:r], cg, err_msg=name)
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(v_d))[:r], vg, err_msg=name)
        # wide decode: R=sub=512 tile from the packed stream
        out = rl_pallas.rl_decode_packed_pallas(
            packed, total, rows, tile_rows=R, sub_rows=R)
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(out)).reshape(-1)[:n], data,
            err_msg=name)


def test_adaptive_tile_selection():
    """encode/decode_tile_rows pick WIDE single-sub tiles only when the
    buffer divides (exp49: slow paths a wash, constant regions ~2x),
    and the hint contract: decode_window_rows must be computed for the
    tile size the decode picks."""
    assert rl_pallas.encode_tile_rows(rl_pallas.ENC_WIDE_ROWS * 2) \
        == rl_pallas.ENC_WIDE_ROWS          # round 5: encode goes 2048
    assert rl_pallas.encode_tile_rows(rl_pallas.WIDE_ROWS * 3) \
        == rl_pallas.WIDE_ROWS              # 3072 % 2048 != 0 -> 1024
    assert rl_pallas.encode_tile_rows(rl_pallas.WIDE_ROWS * 4 + 256) \
        == rl_pallas.TILE_ROWS
    assert rl_pallas.decode_tile_rows(rl_pallas.WIDE_ROWS * 2) \
        == rl_pallas.WIDE_ROWS
    assert rl_pallas.decode_tile_rows(640) == rl_pallas.DEC_TILE_ROWS
    # the hint for a wide tile covers at least the base tile's hint
    g = np.random.default_rng(3)
    counts = np.resize(np.repeat(
        g.integers(0, 256, 4096, np.uint8),
        g.integers(16, 112, 4096)), 1 << 16).astype(np.uint8)
    counts[counts == 0] = 1
    rows_out = -(-int(counts.astype(np.int64).sum()) // 128)
    rows_out = -(-rows_out // 1024) * 1024
    w_small = rl_pallas.decode_window_rows(counts, rows_out, tile_rows=128)
    w_wide = rl_pallas.decode_window_rows(counts, rows_out, tile_rows=1024)
    assert w_wide >= w_small
