"""Round-2: how much per-grid-step fixed cost could multi-sub tiles save?

The dense-uniform fast path (exp37) pushed per-tile COMPUTE down far
enough that fixed per-step costs (DMA issue/wait, SMEM carry traffic,
Mosaic pipeline overhead) plausibly dominate: the b=8 identity arm runs
136 GB/s pair = 1.9 µs per 527 KB-DMA tile-pair (~0.6 µs of DMA).

Probe with IDENTITY cursor-emit kernels (sequential grid, SMEM cursor,
VMEM staging, dynamic-row-offset emit DMA — the production emitter's
skeleton with zero codec compute):

  id256       R=256 steps (the production shape)
  id1024      R=1024 steps, one (R,128) staging + one DMA per step
  id1024sub   R=1024 steps, four 256-row sub-stagings + 4 DMAs (the
              shape a multi-sub integration would take; carries stay in
              registers between subs)

If id1024* ≫ id256, per-step overhead is real and integrating multi-sub
steps into the dense kernels is worth it; if ≈, the fixed cost is per-
DMA/per-byte and the idea is dead.

Usage: timeout 1700 python experiments/exp38_step_overhead.py
"""

import functools
import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

SMOKE = bool(int(os.environ.get("SMOKE", "0")))
if SMOKE:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fl_rl_compression_mpi_tpu.cli import _enable_compile_cache

_enable_compile_cache()
RESULTS = {}
CYCLES = 1 if SMOKE else 3
LANES = 128


def _interpret():
    return jax.default_backend() != "tpu"


def make_ident(R: int, rows: int, subs: int):
    """Identity cursor-emit: each grid step copies its (R,128) block to
    the output at a SMEM-carried row cursor via ``subs`` staged DMAs."""
    grid = rows // R
    S = R // subs

    def kernel(x_ref, o_ref, carry, st_a, st_b, sem):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry[0] = 0
        base_row = carry[0]
        for h in range(subs):
            st = st_a if h % 2 == 0 else st_b
            # wait the DMA that last used this staging buffer (issued
            # two subs ago, or last step's same-parity sub)
            @pl.when((i > 0) | (h >= 2))
            def _(st=st):
                pltpu.make_async_copy(
                    st, o_ref.at[pl.ds(0, S)], sem).wait()
            st[...] = x_ref[h * S:(h + 1) * S] + jnp.uint32(1)
            pltpu.make_async_copy(
                st, o_ref.at[pl.ds(base_row + h * S, S)], sem).start()
        carry[0] = base_row + R

        @pl.when(i == grid - 1)
        def _():
            for h in range(subs):
                st = st_a if h % 2 == 0 else st_b
                @pl.when((h >= subs - 2) | (subs == 1))
                def _(st=st):
                    pltpu.make_async_copy(
                        st, o_ref.at[pl.ds(0, S)], sem).wait()

    def run(x2d):
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec((R, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.uint32),
            scratch_shapes=[
                pltpu.SMEM((1,), jnp.int32),
                pltpu.VMEM((S, LANES), jnp.uint32),
                pltpu.VMEM((S, LANES), jnp.uint32),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=_interpret(),
        )(x2d)
    return run


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
    n = (4 << 20) if SMOKE else (128 << 20)
    rows = n // 4 // LANES
    g = np.random.default_rng(0)
    host = g.integers(0, 1 << 30, rows * LANES, np.uint32)
    x2d = jax.device_put(jnp.asarray(host.reshape(rows, LANES)))

    arms = {
        "id256": make_ident(256, rows, 1),
        "id1024": make_ident(1024, rows, 1),
        "id1024sub": make_ident(1024, rows, 4),
    }
    chains = {}
    for name, fn in arms.items():
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(w, k, fn=fn):
            return jax.lax.fori_loop(0, k, lambda _, v: fn(v), w)
        o1 = np.asarray(jax.device_get(chain(x2d, 1)))
        ok = bool(np.array_equal(o1, host.reshape(rows, LANES) + 1))
        RESULTS[name + "_ok"] = ok
        print(f"{name} ok={ok}", flush=True)
        if ok:
            chains[name] = chain
    if SMOKE:
        print(json.dumps(RESULTS), flush=True)
        return

    for cyc in range(CYCLES):
        for name, chain in chains.items():
            try:
                t = time_chain(chain, x2d, inner=16,
                               reps=(3 if cyc == 0 else 1))
            except Exception:
                print(f"{name}: FAILED "
                      f"{traceback.format_exc()[-300:]}", flush=True)
                continue
            r = 2 * n / 1e9 / t
            RESULTS.setdefault(name, []).append(round(r, 2))
            print(f"cycle {cyc} {name}: {r:.2f} GB/s moved-credit",
                  flush=True)

    print(json.dumps(RESULTS), flush=True)


try:
    main()
except Exception:
    print(f"MAIN FAILED\n{traceback.format_exc()[-800:]}", flush=True)
    print(json.dumps(RESULTS), flush=True)
