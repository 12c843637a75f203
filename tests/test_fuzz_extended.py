"""Extended randomized differential fuzzing across every backend pair.

Heavier than the fuzz battery in conftest: random sizes, distributions and
frame lengths, all compared against the NumPy golden (which the
reference-semantics tests pin).
"""

import numpy as np
import pytest

from fl_rl_compression_mpi_tpu.native import get_native
from fl_rl_compression_mpi_tpu.ops import fl_jax, fl_numpy, rl_jax, rl_numpy

# Heavy interpret-mode / multi-process suite: slow tier (see conftest).
pytestmark = pytest.mark.slow


def _random_case(g):
    kind = g.integers(0, 5)
    size = int(g.integers(1, 200_000))
    if kind == 0:
        return g.integers(0, 256, size, np.uint8)
    if kind == 1:
        return g.integers(0, int(g.integers(2, 32)), size, np.uint8)
    if kind == 2:
        nruns = size // int(g.integers(2, 300)) + 1
        return np.repeat(g.integers(0, 256, nruns, np.uint8),
                         g.integers(1, 600, nruns))[:size].copy()
    if kind == 3:
        return np.zeros(size, np.uint8)
    # blocks of alternating entropy
    parts = [g.integers(0, 256 if i % 2 else 4, 1000, np.uint8)
             for i in range(size // 1000 + 1)]
    return np.concatenate(parts)[:size]


@pytest.mark.parametrize("seed", range(8))
def test_fl_backends_agree(seed):
    g = np.random.default_rng(1000 + seed)
    data = _random_case(g)
    bits_g, values_g = fl_numpy.encode(data)
    bits_d, values_d = fl_jax.encode(data, bucket_frames=32)
    np.testing.assert_array_equal(bits_d, bits_g)
    np.testing.assert_array_equal(values_d, values_g)
    nat = get_native()
    if nat is not None:
        bits_n, values_n = nat.fl_encode(data)
        np.testing.assert_array_equal(bits_n, bits_g)
        np.testing.assert_array_equal(values_n, values_g)
        np.testing.assert_array_equal(
            nat.fl_decode(data.size, bits_g, values_g), data)
    np.testing.assert_array_equal(
        fl_jax.decode(data.size, bits_g, values_g, bucket_frames=32), data)


@pytest.mark.parametrize("seed", range(8))
def test_rl_backends_agree(seed):
    g = np.random.default_rng(2000 + seed)
    data = _random_case(g)
    c_g, v_g = rl_numpy.encode(data)
    c_d, v_d = rl_jax.encode(data, bucket=4096)
    np.testing.assert_array_equal(c_d, c_g)
    np.testing.assert_array_equal(v_d, v_g)
    nat = get_native()
    if nat is not None:
        c_n, v_n = nat.rl_encode(data)
        np.testing.assert_array_equal(c_n, c_g)
        np.testing.assert_array_equal(nat.rl_decode(c_g, v_g), data)
    np.testing.assert_array_equal(rl_jax.decode(c_g, v_g, bucket=4096), data)


@pytest.mark.parametrize("frame_length", [8, 16, 64, 256, 1024])
def test_fl_frame_lengths(frame_length):
    g = np.random.default_rng(frame_length)
    data = g.integers(0, 128, 7 * frame_length + 3, np.uint8)
    bits_g, values_g = fl_numpy.encode(data, frame_length)
    bits_d, values_d = fl_jax.encode(data, frame_length, bucket_frames=4)
    np.testing.assert_array_equal(bits_d, bits_g)
    np.testing.assert_array_equal(values_d, values_g)
    nat = get_native()
    if nat is not None:
        bits_n, values_n = nat.fl_encode(data, frame_length)
        np.testing.assert_array_equal(bits_n, bits_g)
        np.testing.assert_array_equal(values_n, values_g)


@pytest.mark.parametrize("seed", range(6))
def test_dense_dispatch_stack_fuzz(seed, monkeypatch):
    """Randomized differential fuzz of the FULL dense dispatch stack
    (constant → globally-uniform → plan-speculative general → default
    general, each with its authoritative flag), forced on in interpret
    mode with tiny tiles.  Streams are built to straddle dispatch
    boundaries: constant prefixes that break later, width floors that
    are violated near the end, uniform runs with a mixed tail."""
    from fl_rl_compression_mpi_tpu.ops import fl_dense_pallas

    monkeypatch.setattr(fl_dense_pallas, "DENSE_TILE_R", 8)
    monkeypatch.setattr(fl_dense_pallas, "DENSE_DEC_TILE_R", 8)
    monkeypatch.setattr(fl_dense_pallas, "DENSE_UNIFORM_TILE_R", 8)
    monkeypatch.setattr(fl_jax, "_use_dense",
                        lambda L, nw: L == 128 and nw % 1024 == 0)
    monkeypatch.setattr(fl_jax, "_use_dense_dec", fl_jax._use_dense)

    g = np.random.default_rng(7000 + seed)
    tile = 8 * 512
    for _ in range(4):
        kind = int(g.integers(0, 6))
        size = int(g.integers(1, 6 * tile))
        if kind == 0:                      # constant (any byte)
            data = np.full(size, int(g.integers(0, 256)), np.uint8)
        elif kind == 1:                    # constant prefix, then noise
            data = np.full(size, int(g.integers(0, 16)), np.uint8)
            if size > tile:
                data[tile + int(g.integers(0, size - tile)):] ^= 1
        elif kind == 2:                    # width floor violated late
            data = (g.integers(0, 16, size) | 8).astype(np.uint8)
            data[-1:] = 1
        elif kind == 3:                    # uniform run + mixed tail
            b = int(g.integers(1, 9))
            data = g.integers(0, 1 << b, size).astype(np.uint8)
            data[::128][: size // 256] = (1 << (b - 1))
            if size > 2 * tile:
                data[2 * tile:] = g.integers(0, 256, size - 2 * tile)
        elif kind == 4:                    # random widths per frame
            data = g.integers(0, 256, size).astype(np.uint8)
            nfr = size // 128
            if nfr:
                wf = g.integers(1, 9, nfr)
                m2 = data[: nfr * 128].reshape(nfr, 128)
                m2 &= ((1 << wf) - 1).astype(np.uint8)[:, None]
        else:                              # pure noise
            data = g.integers(0, 256, size).astype(np.uint8)
        bits_g, values_g = fl_numpy.encode(data)
        bits_d, values_d = fl_jax.encode(data, bucket_frames=32)
        np.testing.assert_array_equal(bits_d, bits_g)
        np.testing.assert_array_equal(values_d, values_g)
        np.testing.assert_array_equal(
            fl_jax.decode(data.size, bits_d, values_d,
                          bucket_frames=32), data)
