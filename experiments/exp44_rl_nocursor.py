"""Round-3: falsify (or confirm) the two-pass RL encode hypothesis.

VERDICT r2 proposed de-serializing the RL encode: pass 1 routes every
tile independently into per-tile staging + counts (parallel grid, no
cross-tile carries), pass 2 compacts staging by prefix offsets.  That
helps ONLY if the sequential cursor/carry machinery is what limits the
production kernel — exp13/exp33 already suggest the ~50 dependent vector
rounds per tile are the cost, and grid steps execute on one core either
way.

Arm: `nocursor` = the production slow-path pipeline (flags → key
prefix-max → cap flags → prefix-sum → pack → per-sub compact) with ALL
sequential machinery removed: no prev-byte/residue/cursor carries, no
merge shift, no carry row, no bucketed emit — each tile writes its
compacted pieces to its own BlockSpec output block, grid fully parallel.
This is a STRICT UPPER BOUND on pass 1 of the two-pass design (pass 2
adds a full extra read+write of the compressed stream).  If
`nocursor` ≈ production rate, the two-pass design is refuted.

Usage: timeout 1700 python experiments/exp44_rl_nocursor.py
SMOKE=1: interpret-mode shape check on CPU.
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
from fl_rl_compression_mpi_tpu.ops import lanes, rl_pallas
from fl_rl_compression_mpi_tpu.ops.lanes import LANES, flat_idx, \
    flat_shift_up
from fl_rl_compression_mpi_tpu.ops.rl_pallas import _mod255

_enable_compile_cache()
RESULTS = {}
CYCLES = 1 if SMOKE else 3


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def nocursor_kernel(R: int):
    nbits = (R * LANES - 1).bit_length()

    def kernel(x_ref, out_ref):
        i = pl.program_id(0)
        xm = x_ref[...].astype(jnp.int32)
        fidx = flat_idx(R)
        gidx = i * R * LANES + fidx

        prev = flat_shift_up(xm, 1, -1)       # tile-local (no carry)
        s = xm != prev
        gmod = _mod255(gidx)
        key = jnp.where(s, (fidx << 8) | gmod, -1)
        r = lanes.prefix_max_flat(key)
        lsmod = jnp.where(r >= 0, r & 255, 0)
        pflag = s | (gmod == lsmod)
        keep = pflag
        psum = lanes.prefix_sum_flat(keep.astype(jnp.int32))
        payload16 = (xm & jnp.int32(0xFF)) | ((gidx & jnp.int32(0xFF))
                                              << 8)
        dist = fidx - (psum - 1)
        w = lanes.pack_route(keep, dist, payload16)
        out_ref[...] = lanes.compact_lsb(w, nbits)
    return kernel


def main():
    R = rl_pallas.TILE_ROWS
    nr = (1 << 20) if SMOKE else (64 << 20)
    rows = nr // 128
    g = np.random.default_rng(12)
    k = nr // 32
    host = np.repeat(g.integers(0, 256, k, np.uint8),
                     g.integers(16, 112, k))[:nr].copy()
    x2d = jax.device_put(jnp.asarray(host.reshape(rows, LANES)))

    f = pl.pallas_call(
        nocursor_kernel(R),
        grid=(rows // R,),
        in_specs=[pl.BlockSpec((R, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=jax.default_backend() != "tpu",
    )

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(v, k, f=f):
        def step(_, c):
            # value-neutral data dependence on the previous iteration —
            # c[1] is a sum of outputs (sign unknown to XLA), so the
            # kernel input genuinely depends on the prior result and the
            # loop body cannot be hoisted/CSE'd, while the bytes stay
            # identical (the where is always 0)
            x = c[0] + jnp.where(c[1] < 0, jnp.uint8(1), jnp.uint8(0))
            o = f(x)
            return (c[0], o[0, 0])
        return jax.lax.fori_loop(0, k, step, (v, jnp.int32(0)))[1]

    o = jax.device_get(chain(x2d, 1))
    print(f"nocursor ran, sink={int(o)}", flush=True)
    if SMOKE:
        RESULTS["smoke"] = True
        print(json.dumps(RESULTS), flush=True)
        return

    nn = jnp.int32(nr)

    def enc_only(v):
        packed, total = rl_pallas.rl_encode_pallas(v, nn)
        return packed.reshape(-1, LANES)[:rows] \
            .astype(jnp.uint8).astype(jnp.int32)

    @functools.partial(jax.jit, static_argnames=("k",))
    def prod_chain(v, k):
        def step(_, c):
            x = c[0] + jnp.where(c[1] < 0, jnp.uint8(1), jnp.uint8(0))
            o = enc_only(x)
            return (c[0], o[0, 0])
        return jax.lax.fori_loop(0, k, step, (v, jnp.int32(0)))[1]

    def time_chain(chain, w, inner, reps=3):
        jax.device_get(chain(w, 1))
        jax.device_get(chain(w, 1 + inner))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.device_get(chain(w, 1))
            t1 = time.perf_counter()
            jax.device_get(chain(w, 1 + inner))
            t2 = time.perf_counter()
            ts.append(((t2 - t1) - (t1 - t0)) / inner)
        return max(float(np.median(ts)), 1e-9)

    for cyc in range(CYCLES):
        for name, ch in (("nocursor", chain), ("prod_encode", prod_chain)):
            try:
                t = time_chain(ch, x2d, inner=6,
                               reps=(3 if cyc == 0 else 1))
                r = nr / 1e9 / t
                RESULTS.setdefault(name, []).append(round(r, 2))
                print(f"cycle {cyc} {name}: {r:.2f} GB/s encode-only",
                      flush=True)
            except Exception:
                print(f"{name}: FAILED "
                      f"{traceback.format_exc()[-300:]}", flush=True)

    print(json.dumps(RESULTS), flush=True)


try:
    main()
except Exception:
    print(f"MAIN FAILED\n{traceback.format_exc()[-800:]}", flush=True)
    print(json.dumps(RESULTS), flush=True)
