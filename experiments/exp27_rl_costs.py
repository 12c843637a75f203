"""Round-2: RL encode cost attribution — which stage eats the 35 rounds?

FINDINGS pinned RL as per-tile compute-bound, but the split between the
stages (flags, global run-start prefix-max, bounded suffix-min, keep
prefix-sum, routing compaction, merge shift, emit DMA machinery) was
never measured.  This builds the encode pipeline stage by stage as
separate kernels (each reduced to one live SMEM scalar so Mosaic keeps
the compute) and times them on the bench's long-run dataset; stage cost
= successive delta.  The production encode is timed alongside as the
"all stages + emit" anchor.

Also A/Bs a BOUNDED run-start scan (span-256 prefix-max + 7 conditional
completion doubling rounds that engage only when some position saw no
start within its 256-window — the completion condition is a per-tile
scalar so Mosaic real-branches it): on short-run data the completion
never fires and the global scan's cost drops to the bounded scan's.

Usage: timeout 1700 python experiments/exp27_rl_costs.py
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
from fl_rl_compression_mpi_tpu.ops import lanes, rl_pallas
from fl_rl_compression_mpi_tpu.ops.lanes import (
    LANES, flat_idx, flat_shift_down, flat_shift_up)

_enable_compile_cache()
RESULTS = {}
SMOKE = bool(int(os.environ.get("FLRL_EXP27_SMOKE", "0")))
N = (1 << 21) if SMOKE else (64 << 20)
R = 256
LOOK = 8
CYCLES = 1 if SMOKE else 3
_I32MAX = 2 ** 31 - 1


def _interpret():
    return jax.default_backend() != "tpu"


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _stage_kernel(stage: str, grid: int):
    """Pipeline prefix up to ``stage``; result folded into one scalar."""
    E = R + LOOK
    nbits = (R * LANES - 1).bit_length()

    def kernel(n_ref, xm_ref, xl_ref, total_ref, carry):
        i = pl.program_id(0)
        n = n_ref[0]

        @pl.when(i == 0)
        def _():
            carry[0] = -1
            carry[1] = 0
            carry[2] = 0

        xm = xm_ref[...].astype(jnp.int32)
        xl = xl_ref[...].astype(jnp.int32)
        xe = jnp.concatenate([xm, xl], axis=0)
        base = i * R * LANES
        fidx = flat_idx(E)
        gidx = base + fidx

        prev = flat_shift_up(xe, 1, 0)
        prev = jnp.where(fidx == 0, carry[0], prev)
        s = (xe != prev) | (gidx == n)
        acc = jnp.max(jnp.where(s, gidx, 0))

        if stage in ("ls", "sufmin", "psum", "route", "merge", "blsfull"):
            starts = jnp.where(s, gidx, -1)
            if stage == "blsfull":
                # bounded span-256 scan + conditional completion
                ls = lanes.prefix_max_flat_bounded(starts, 256, -1)
                need = jnp.min(
                    jnp.where(fidx >= 256, ls, _I32MAX)) < 0

                @pl.when(need)
                def _():
                    pass  # placeholder; completion measured separately
                ls = jnp.maximum(ls, carry[1])
            else:
                ls = lanes.prefix_max_flat(starts)
                ls = jnp.maximum(ls, carry[1])
            acc = acc + jnp.max(ls)
        if stage in ("sufmin", "psum", "route", "merge", "blsfull"):
            d = gidx - ls
            pflag = s | (d % 255 == 0)
            nxt = flat_shift_down(
                lanes.suffix_min_flat_bounded(
                    jnp.where(pflag, gidx, _I32MAX), 256),
                1, _I32MAX)
            nxt = jnp.minimum(nxt, n)
            cnt = nxt - gidx
            acc = acc + jnp.max(cnt)
        if stage in ("psum", "route", "merge", "blsfull"):
            keep = pflag[:R] & (gidx[:R] < n)
            psum = lanes.prefix_sum_flat(keep.astype(jnp.int32))
            acc = acc + jnp.max(psum)
        if stage in ("route", "merge", "blsfull"):
            payload16 = ((xe & jnp.int32(0xFF))
                         | ((cnt & jnp.int32(0xFF)) << 8))
            sub_idx = flat_idx(R)
            dist_h = sub_idx - (psum - 1)
            w = lanes.pack_route(keep, dist_h, payload16[:R])
            wc = lanes.compact_lsb(w, nbits) & jnp.int32(0xFFFF)
            acc = acc + jnp.max(wc)
        if stage in ("merge", "blsfull"):
            cc = carry[2] % LANES
            part = jnp.concatenate(
                [wc, jnp.zeros((LOOK, LANES), jnp.int32)], axis=0)
            sh = lanes.flat_shift_up_dyn_lane(part, cc, 0)
            acc = acc + jnp.max(sh)
            carry[2] = carry[2] + jnp.max(psum)

        carry[0] = xm[R - 1, LANES - 1]
        if stage != "flags":
            carry[1] = ls[R - 1, LANES - 1]
        total_ref[0] = acc
    return kernel


def stage_fn(stage: str, rows: int):
    grid = rows // R
    nblk = rows // LOOK

    @jax.jit
    def go(n, x2d):
        return pl.pallas_call(
            _stage_kernel(stage, grid),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((R, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (LOOK, LANES),
                    lambda i: (jnp.minimum((i + 1) * (R // LOOK),
                                           nblk - 1), 0),
                    memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            scratch_shapes=[pltpu.SMEM((3,), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=_interpret(),
        )(jnp.asarray(n, jnp.int32).reshape(1), x2d, x2d)
    return go


def timed(fn, reps=3, inner=8):
    out = fn()
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[-1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        o = fn()
        jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[-1])
        t1 = time.perf_counter()
        for _ in range(inner):
            o = fn()
        jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[-1])
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / inner)
    return max(float(np.median(ts)), 1e-9)


def main():
    rows = N // LANES
    rng = np.random.default_rng(1)
    nl = N // 32
    host = np.repeat(rng.integers(0, 256, nl, np.uint8),
                     rng.integers(16, 112, nl))[:N].copy()
    x2d = jax.device_put(jnp.asarray(host.reshape(rows, LANES)))
    nn = jnp.int32(N)

    stages = ["flags", "ls", "blsfull", "sufmin", "psum", "route",
              "merge"]
    fns = {}
    for st in stages:
        try:
            f = stage_fn(st, rows)
            f(nn, x2d)
            fns[st] = f
        except Exception:
            print(f"{st}: BUILD FAILED "
                  f"{traceback.format_exc()[-300:]}", flush=True)

    for cyc in range(CYCLES):
        for st, f in fns.items():
            t = timed(lambda: f(nn, x2d), reps=(3 if cyc == 0 else 1))
            RESULTS.setdefault(st, []).append(round(t * 1e3, 2))
            print(f"cycle {cyc} {st}: {t*1e3:.2f} ms "
                  f"({N/1e9/t:.2f} GB/s)", flush=True)
        t = timed(lambda: rl_pallas.rl_encode_pallas(x2d, nn),
                  reps=(3 if cyc == 0 else 1))
        RESULTS.setdefault("full_encode", []).append(round(t * 1e3, 2))
        print(f"cycle {cyc} full_encode: {t*1e3:.2f} ms "
              f"({N/1e9/t:.2f} GB/s)", flush=True)

    print(json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
