"""Round-3: dense encode emit-bandwidth probe — exact-size disjoint emits
+ double staging + tile-size curve.

exp40's ladder showed the R=256 identity (BlockSpec in/out, zero compute)
moves only ~300 GB/s while the R=2048 copy chain moves ~640 — and the w8
production encode (near-zero codec compute after the round cuts) sits at
the same ~340 cap as exp38's cursor-emit skeletons.  Hypotheses:

  H1 small blocks cap the BlockSpec pipeline (L0 at R=256 vs 512/1024/2048
     shows the knee);
  H2 the cursor emitter serializes on its single staging + strict-order
     DMA: a uniform tile emits exactly 16·b·R words = (b·R/8)·128 — a
     whole-row region DISJOINT from the next tile's — so with two
     stagings the emit DMAs can overlap and no junk-tail ordering wait is
     needed.

Arms (same session, interleaved):
  l0_R{r}        — identity copy, BlockSpec, parallel grid
  pair_prod_{k}  — production dense pair (R=256) on stream k
  pair_x{r}_{k}  — exact-emit fast-only encode at R=r (+ production
                   decode at 256) on stream k ∈ {w4, w8}

Usage: timeout 1700 python experiments/exp41_exact_emit.py
SMOKE=1 runs interpret-mode parity on CPU.
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
from fl_rl_compression_mpi_tpu.ops import fl_dense_pallas, fl_numpy
from fl_rl_compression_mpi_tpu.ops.fl_dense_pallas import (
    _pack_groups_b, _uniform_place, _uniform_place_masks)
from fl_rl_compression_mpi_tpu.ops.fl_pallas import (
    _frame_widths_fpr_mxu, _word_widths_f32exp)

_enable_compile_cache()
RESULTS = {}
CYCLES = 1 if SMOKE else 3
LANES = 128


def _interp():
    return jax.default_backend() != "tpu"


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


def l0_chain(rows, R):
    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...] + jnp.uint32(1)

    def f(w):
        return pl.pallas_call(
            k, grid=(rows // R,),
            in_specs=[pl.BlockSpec((R, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=_interp(),
        )(w)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(w, k):
        return jax.lax.fori_loop(0, k, lambda _, v: f(v), w)
    return chain


# ---------------------------------------------------------------------------
# Exact-emit fast-only encode: every tile assumed uniform width fb.
# Emits exactly Kr = fb*R/8 rows per tile — regions disjoint across tiles,
# so the two stagings' DMAs overlap freely (wait only your OWN staging's
# previous copy, two tiles back; drain both at the end).
# ---------------------------------------------------------------------------

def fastenc_kernel(fb: int, R: int, grid: int, slots):
    Kr = fb * R // 8

    def kernel(w_ref, lm_ref, rm_ref, bits_ref, out_ref,
               stg_a, stg_b, sem_a, sem_b):
        i = pl.program_id(0)
        w = w_ref[...].astype(jnp.uint32)
        o = w | (w >> 8)
        o = (o | (o >> 16)) & jnp.uint32(0xFF)
        wq = _word_widths_f32exp(o)
        b_fpr = _frame_widths_fpr_mxu(wq, 32)
        bits_ref[...] = b_fpr.astype(jnp.uint8)
        if fb == 8:
            pay = w
        else:
            sp = ((w & jnp.uint32(0xFF))
                  | (((w >> 8) & jnp.uint32(0xFF)) << fb)
                  | (((w >> 16) & jnp.uint32(0xFF)) << (2 * fb))
                  | ((w >> 24) << (3 * fb)))
            pay = _uniform_place(_pack_groups_b(sp, fb), fb, R,
                                 lm_ref[...], rm_ref[...], slots)

        def body(stg, sem, pstg, psem):
            @pl.when(i >= 2)
            def _():
                pltpu.make_async_copy(
                    stg.at[:Kr], out_ref.at[pl.ds((i - 2) * Kr, Kr)],
                    sem).wait()
            stg[...] = pay
            pltpu.make_async_copy(
                stg.at[:Kr], out_ref.at[pl.ds(i * Kr, Kr)], sem).start()

            @pl.when(i == grid - 1)
            def _():
                pltpu.make_async_copy(
                    stg.at[:Kr], out_ref.at[pl.ds(i * Kr, Kr)],
                    sem).wait()

                @pl.when(i >= 1)
                def _():
                    pltpu.make_async_copy(
                        pstg.at[:Kr],
                        out_ref.at[pl.ds((i - 1) * Kr, Kr)], psem).wait()

        @pl.when(i % 2 == 0)
        def _():
            body(stg_a, sem_a, stg_b, sem_b)

        @pl.when(i % 2 == 1)
        def _():
            body(stg_b, sem_b, stg_a, sem_a)
    return kernel


def make_fastenc(fb: int, R: int, nw: int, pad_rows: int):
    rows = nw // LANES
    grid = rows // R
    lm, rm, slots = _uniform_place_masks(R)
    assert slots is not None, R
    lmj, rmj = jnp.asarray(lm), jnp.asarray(rm)

    @jax.jit
    def f(words2d):
        return pl.pallas_call(
            fastenc_kernel(fb, R, grid, slots),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((R, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((R, 4), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((rows, 4), jnp.uint8),
                jax.ShapeDtypeStruct((pad_rows, LANES), jnp.uint32),
            ],
            scratch_shapes=[
                pltpu.VMEM((R, LANES), jnp.uint32),
                pltpu.VMEM((R, LANES), jnp.uint32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=_interp(),
        )(words2d, lmj, rmj)
    return f


def gen(seed, n, kind):
    g = np.random.default_rng(seed)
    return (g.integers(0, 16, n, np.uint8) if kind == "w4"
            else g.integers(0, 256, n, np.uint8))


def main():
    nd = (8 << 20) if SMOKE else (128 << 20)
    nwd = nd // 4
    rows = nwd // LANES
    R_dec = fl_dense_pallas.DENSE_DEC_TILE_R

    # interpret-mode / chip parity of the exact-emit encoder
    for fb, R in (((4, 8), (8, 8)) if SMOKE else
                  ((4, 256), (8, 256), (4, 1024), (8, 1024))):
        npar = 4 * R * LANES * 4
        host = gen(5, npar, "w4" if fb == 4 else "w8")
        Kr_rows = (npar // 4 // LANES) * fb // 8
        f = make_fastenc(fb, R, npar // 4, Kr_rows + 8)
        b2, dense = f(jnp.asarray(
            host.view(np.uint32).reshape(-1, LANES)))
        bg, vg = fl_numpy.encode(host)
        ok = (np.array_equal(np.asarray(b2).reshape(-1), bg)
              and np.array_equal(
                  np.asarray(dense).reshape(-1).view(np.uint8)[:vg.size],
                  vg))
        RESULTS[f"xparity_b{fb}_R{R}"] = bool(ok)
        print(f"exact-emit parity fb={fb} R={R}: {ok}", flush=True)
    if SMOKE or not all(v for k, v in RESULTS.items()
                        if k.startswith("xparity")):
        print(json.dumps(RESULTS), flush=True)
        return

    chains = {}

    # L0 identity at several tile sizes
    w0 = jax.device_put(jnp.asarray(
        gen(1, nd, "w8").view(np.uint32).reshape(rows, LANES)))
    for R in (256, 512, 1024, 2048):
        chains[f"l0_R{R}"] = (l0_chain(rows, R), w0, 2 * nd, 12)

    # production pair baseline
    nf = jnp.int32(nd // 128)
    for kind in ("w4", "w8"):
        host = gen(11, nd, kind)
        words = jax.device_put(jnp.asarray(host.view(np.uint32)))

        def prod_rt(w, nf=nf):
            b2, dense, _, woffs = \
                fl_dense_pallas.fl_encode_dense_pallas(w, nf)
            return fl_dense_pallas.fl_decode_dense_pallas(
                dense.reshape(-1, 128), b2, woffs, nf).reshape(-1)

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(w, k, fn=prod_rt):
            return jax.lax.fori_loop(0, k, lambda _, v: fn(v), w)

        o1 = np.asarray(jax.device_get(chain(words, 1)))
        ok = bool(np.array_equal(o1.view(np.uint8), host))
        print(f"pair_prod_{kind} ok={ok}", flush=True)
        if ok:
            chains[f"pair_prod_{kind}"] = (chain, words, 2 * nd, 6)

        # exact-emit encode variants + production decode (R_dec tiles);
        # uniform stream -> static per-tile word offsets
        fb = 4 if kind == "w4" else 8
        pad_rows = rows * fb // 8 + R_dec + 32
        grid_dec = rows // R_dec
        woffs = jnp.asarray(
            np.arange(grid_dec, dtype=np.int32) * (16 * fb * R_dec))
        for R in (256, 1024):
            fenc = make_fastenc(fb, R, nwd, pad_rows)

            def x_rt(w, fenc=fenc, woffs=woffs, nf=nf):
                b2, dense = fenc(w.reshape(rows, LANES))
                return fl_dense_pallas.fl_decode_dense_pallas(
                    dense, b2, woffs, nf).reshape(-1)

            @functools.partial(jax.jit, static_argnames=("k",))
            def xchain(w, k, fn=x_rt):
                return jax.lax.fori_loop(0, k, lambda _, v: fn(v), w)

            o1 = np.asarray(jax.device_get(xchain(words, 1)))
            ok = bool(np.array_equal(o1.view(np.uint8), host))
            print(f"pair_x{R}_{kind} ok={ok}", flush=True)
            if ok:
                chains[f"pair_x{R}_{kind}"] = (xchain, words, 2 * nd, 6)

    for cyc in range(CYCLES):
        for name, (chain, w, byts, inner) in chains.items():
            try:
                t = time_chain(chain, w, inner=inner,
                               reps=(3 if cyc == 0 else 1))
            except Exception:
                print(f"{name}: FAILED "
                      f"{traceback.format_exc()[-300:]}", flush=True)
                continue
            r = byts / 1e9 / t
            RESULTS.setdefault(name, []).append(round(r, 2))
            print(f"cycle {cyc} {name}: {r:.2f} GB/s", flush=True)

    print(json.dumps(RESULTS), flush=True)


try:
    main()
except Exception:
    print(f"MAIN FAILED\n{traceback.format_exc()[-800:]}", flush=True)
    print(json.dumps(RESULTS), flush=True)
