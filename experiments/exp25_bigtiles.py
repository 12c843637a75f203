"""Round-2: big-tile A/B — does raising the Mosaic VMEM cap buy headline?

exp20/exp22 established the chained FL pair sits AT the same-session
copy-chain ceiling, and that ceiling itself carries ~1 us of fixed
per-tile overhead (grid step + DMA issue): at 2048-row (1 MiB) tiles a
256 MiB chain pays 256 fixed costs per op.  exp6 found 4096-row encode
tiles fail the default scoped-VMEM budget; Mosaic's budget is a
COMPILER limit (`vmem_limit_bytes`), not necessarily the hardware cap.

This experiment raises the limit and A/Bs, interleaved in one session:

  copy2048            the current practical ceiling reference
  copy4096/copy8192   does the CEILING move with bigger tiles?
  rt 2048/1024        production tile combo (bench.py's usual winner)
  rt 4096/4096 etc.   the codec chain at big tiles

If copy4096 > copy2048, bigger tiles are a real lever and the rt combos
tell us how much the codec captures; if not, the 1 us/tile theory is
wrong and the ceiling is elsewhere.

Usage: timeout 1700 python experiments/exp25_bigtiles.py
"""

import functools
import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fl_rl_compression_mpi_tpu.cli import _enable_compile_cache
from fl_rl_compression_mpi_tpu.ops import fl_pallas
from fl_rl_compression_mpi_tpu.ops.fl_pallas import (
    LANES, _encode_kernel, _decode_kernel)

_enable_compile_cache()
RESULTS = {}
SMOKE = bool(int(os.environ.get("FLRL_EXP25_SMOKE", "0")))
N = (1 << 22) if SMOKE else (256 << 20)
NROWS = (N // 4) // LANES
WPF = 32
FPR = 4
CYCLES = 1 if SMOKE else 3
VLIM = 100 << 20          # requested Mosaic VMEM budget for big tiles


def _interpret():
    return jax.default_backend() != "tpu"


def _params(vlim):
    kw = dict(dimension_semantics=("parallel",))
    if vlim:
        kw["vmem_limit_bytes"] = vlim
    return pltpu.CompilerParams(**kw)


def enc(tile_r, vlim):
    grid = NROWS // tile_r

    @jax.jit
    def go(w2d):
        return pl.pallas_call(
            _encode_kernel(WPF, tile_r),
            grid=(grid,),
            in_specs=[pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_r, FPR), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((NROWS, LANES), jnp.uint32),
                jax.ShapeDtypeStruct((NROWS, FPR), jnp.uint8),
            ],
            compiler_params=_params(vlim),
            interpret=_interpret(),
        )(w2d)
    return go


def dec(tile_r, vlim):
    grid = NROWS // tile_r

    @jax.jit
    def go(f2d, bits2d):
        return pl.pallas_call(
            _decode_kernel(WPF),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_r, FPR), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NROWS, LANES), jnp.uint32),
            compiler_params=_params(vlim),
            interpret=_interpret(),
        )(f2d, bits2d)
    return go


def make_rt(et, dt, vlim):
    ego, dgo = enc(et, vlim), dec(dt, vlim)

    def roundtrip(w2d):
        f, b = ego(w2d)
        return dgo(f, b)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(w2d, k):
        return jax.lax.fori_loop(0, k, lambda _, v: roundtrip(v), w2d)
    return chain, roundtrip


def make_copy(tile_r, vlim):
    grid = NROWS // tile_r

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + jnp.uint32(1)

    def cp(w2d):
        return pl.pallas_call(
            kernel, grid=(grid,),
            in_specs=[pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NROWS, LANES), jnp.uint32),
            compiler_params=_params(vlim),
            interpret=_interpret(),
        )(w2d)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(w2d, k):
        return jax.lax.fori_loop(0, k, lambda _, v: cp(cp(v)), w2d)
    return chain


def time_chain(chain, w, inner, reps=3):
    jax.device_get(chain(w, 1).ravel()[-1])
    jax.device_get(chain(w, 1 + inner).ravel()[-1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(chain(w, 1).ravel()[-1])
        t1 = time.perf_counter()
        jax.device_get(chain(w, 1 + inner).ravel()[-1])
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / inner)
    return max(float(np.median(ts)), 1e-9)


def main():
    rng = np.random.default_rng(0)
    host = rng.integers(0, 16, N, np.uint8)        # bench dataset (w4)
    w2d = jax.device_put(
        jnp.asarray(host.view(np.uint32).reshape(NROWS, LANES)))

    s = 8 if SMOKE else 1
    variants = {}

    def add_rt(name, et, dt, vlim):
        try:
            chain, roundtrip = make_rt(et, dt, vlim)
            out = roundtrip(w2d)
            ok = bool(np.array_equal(
                np.asarray(jax.device_get(out)).reshape(-1)
                .view(np.uint8), host))
            RESULTS[f"parity_{name}"] = ok
            print(f"parity {name}: {ok}", flush=True)
            if ok:
                variants[name] = (chain, 48 // s)
        except Exception:
            print(f"{name}: BUILD FAILED "
                  f"{traceback.format_exc()[-300:]}", flush=True)

    def add_copy(name, tile_r, vlim):
        try:
            chain = make_copy(tile_r, vlim)
            jax.device_get(chain(w2d, 1).ravel()[-1])
            variants[name] = (chain, 48 // s)
        except Exception:
            print(f"{name}: BUILD FAILED "
                  f"{traceback.format_exc()[-300:]}", flush=True)

    add_copy("copy2048", 2048, None)
    add_copy("copy4096", 4096, VLIM)
    if not SMOKE:
        add_copy("copy8192", 8192, VLIM)
    add_rt("rt_2048_1024", 2048, 1024, None)
    add_rt("rt_4096_4096", 4096, 4096, VLIM)
    if not SMOKE:
        add_rt("rt_4096_2048", 4096, 2048, VLIM)
        add_rt("rt_8192_8192", 8192, 8192, VLIM)

    for cyc in range(CYCLES):
        for name, (chain, inner) in variants.items():
            try:
                t = time_chain(chain, w2d, inner,
                               reps=(3 if cyc == 0 else 1))
            except Exception:
                print(f"{name}: RUN FAILED "
                      f"{traceback.format_exc()[-300:]}", flush=True)
                continue
            r = 2 * N / 1e9 / t
            RESULTS.setdefault(name, []).append(round(r, 1))
            print(f"cycle {cyc} {name}: {r:.1f} GB/s", flush=True)

    print(json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
