"""lanes.py primitives vs NumPy semantics (Pallas interpret mode)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fl_rl_compression_mpi_tpu.ops import lanes

R = 8
N = R * 128


def _run(fn, *arrays):
    """Run fn (taking/returning (R,128) i32 register arrays) as a Pallas
    interpret kernel."""
    def kernel(*refs):
        ins = [r[...] for r in refs[:-1]]
        refs[-1][...] = fn(*ins)

    @jax.jit
    def go(*xs):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(xs),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
            interpret=True,
        )(*xs)
    return np.asarray(go(*[jnp.asarray(a, jnp.int32).reshape(R, 128)
                           for a in arrays])).reshape(-1)


def rng(seed=0):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("m", [1, 2, 4, 64, 127, 128, 256, 512])
def test_flat_shift_down(m):
    x = rng(1).integers(0, 1 << 20, N)
    got = _run(lambda a: lanes.flat_shift_down(a, m, -7), x)
    exp = np.full(N, -7, np.int64)
    exp[:N - m] = x[m:]
    np.testing.assert_array_equal(got, exp)


@pytest.mark.parametrize("m", [1, 2, 64, 127, 128, 384])
def test_flat_shift_up(m):
    x = rng(2).integers(0, 1 << 20, N)
    got = _run(lambda a: lanes.flat_shift_up(a, m, -3), x)
    exp = np.full(N, -3, np.int64)
    exp[m:] = x[:N - m]
    np.testing.assert_array_equal(got, exp)


@pytest.mark.parametrize("m", [0, 1, 63, 127, 128, 129, 500, N - 1])
def test_flat_shift_dyn(m):
    """Dynamic (traced-m) shifts match their static counterparts."""
    x = rng(3).integers(0, 1 << 20, N)
    mv = np.full(N, m, np.int64)    # traced scalar via array element
    got = _run(lambda a, mm: lanes.flat_shift_up_dyn(a, mm[0, 0], -3),
               x, mv)
    exp = np.full(N, -3, np.int64)
    exp[m:] = x[:N - m] if m else x
    np.testing.assert_array_equal(got, exp)

    got = _run(lambda a, mm: lanes.flat_shift_down_dyn(a, mm[0, 0], -7),
               x, mv)
    exp = np.full(N, -7, np.int64)
    exp[:N - m] = x[m:] if m else x
    np.testing.assert_array_equal(got, exp)


def test_prefix_max_flat():
    x = rng(3).integers(-1000, 1000, N)
    got = _run(lambda a: lanes.prefix_max_flat(a), x)
    np.testing.assert_array_equal(got, np.maximum.accumulate(x))


def test_prefix_sum_flat():
    x = rng(4).integers(0, 100, N)
    got = _run(lambda a: lanes.prefix_sum_flat(a), x)
    np.testing.assert_array_equal(got, np.cumsum(x))


def test_suffix_min_flat():
    x = rng(5).integers(-1000, 1000, N)
    got = _run(lambda a: lanes.suffix_min_flat(a), x)
    np.testing.assert_array_equal(got, np.minimum.accumulate(x[::-1])[::-1])


@pytest.mark.parametrize("seed,density", [(6, 0.02), (7, 0.3), (8, 0.9),
                                          (9, 1.0)])
def test_compact_lsb(seed, density):
    g = rng(seed)
    keep = g.random(N) < density
    keep[0] = True
    payload = g.integers(0, 1 << 16, N)
    j = np.cumsum(keep) - 1
    dist = np.where(keep, np.arange(N) - j, 0)

    def fn(pay, kp, ds):
        w = lanes.pack_route(kp != 0, ds, pay)
        return lanes.compact_lsb(w, 10)
    got = _run(fn, payload, keep.astype(np.int64), dist)
    K = keep.sum()
    np.testing.assert_array_equal(got[:K] & 0xFFFF, payload[keep])
    assert (got[:K] < 0).all()          # live bits survive
    assert (got[K:] >= 0).all()         # rest dead


@pytest.mark.parametrize("seed,nk", [(10, 13), (11, 300), (12, 1024)])
def test_expand_msb(seed, nk):
    g = rng(seed)
    targets = np.sort(g.choice(N, nk, replace=False))
    payload = g.integers(0, 1 << 16, N)
    dist = np.zeros(N, np.int64)
    live = np.zeros(N, np.int64)
    dist[:nk] = targets - np.arange(nk)
    live[:nk] = 1

    def fn(pay, lv, ds):
        w = lanes.pack_route(lv != 0, ds, pay)
        return lanes.expand_msb(w, 10)
    got = _run(fn, payload, live, dist)
    np.testing.assert_array_equal(got[targets] & 0xFFFF, payload[:nk])
    live_out = got < 0
    np.testing.assert_array_equal(np.flatnonzero(live_out), targets)
