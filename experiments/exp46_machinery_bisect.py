"""Round-3: bisect the dense encode "machinery gap".

Same-session facts (exp41/exp45): a STRIPPED uniform-width encoder
(no dispatch, no general branch, no carries) pairs at 215-312 GB/s on
w8 while the full production kernel pairs at ~140-228 — and the
exact-emit double staging measured as a LOSS inside the full kernel
(exp45 `no` vs `oo`).  So the ~40% gap is machinery, not emit style.
Which piece?  Arms (one session, interleaved; every arm's encoder is
paired with the SAME git-4158a77 decoder, so differences isolate the
encoder):

  strip_x   — no dispatch, exact-emit double staging   (exp41 repro)
  strip_s   — no dispatch, strict single-staging emit  (emit style at
              stripped level)
  disp_s    — + uniformity check, cursor/woff carries, pow2 width
              branches (4), strict emit; NO odd branches, NO odd mask
              input, NO general branch
  dispodd_s — disp_s + odd branches + the (3R,128) flat-mask input
  oo        — git 4158a77 production (full: + general branch)

Usage: timeout 1700 python experiments/exp46_machinery_bisect.py
SMOKE=1: interpret parity on CPU.
"""

import functools
import json
import os
import re
import subprocess
import sys
import time
import traceback
import types

sys.path.insert(0, "/root/repo")

SMOKE = bool(int(os.environ.get("SMOKE", "0")))
if SMOKE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["FLRL_DENSE_TILE_R"] = "8"
    os.environ["FLRL_DENSE_DEC_TILE_R"] = "8"

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fl_rl_compression_mpi_tpu.cli import _enable_compile_cache
from fl_rl_compression_mpi_tpu.ops import fl_numpy
from fl_rl_compression_mpi_tpu.ops.fl_dense_pallas import (
    _flat_place, _odd_place_masks, _pack_groups_b, _uniform_place,
    _uniform_place_masks, ODD_BS)
from fl_rl_compression_mpi_tpu.ops.fl_pallas import (
    _frame_widths_fpr_mxu, _word_widths_f32exp)
from fl_rl_compression_mpi_tpu.ops.lanes import LANES

_enable_compile_cache()
RESULTS = {}
CYCLES = 1 if SMOKE else 3
FAST_BS = (1, 2, 4, 8)


def _interp():
    return jax.default_backend() != "tpu"


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def load_old(relpath, name, rev="4158a77"):
    src = subprocess.check_output(
        ["git", "-C", "/root/repo", "show", f"{rev}:{relpath}"],
        text=True)
    src = re.sub(r"from \.(\w+) import",
                 r"from fl_rl_compression_mpi_tpu.ops.\1 import", src)
    src = re.sub(r"from \. import",
                 "from fl_rl_compression_mpi_tpu.ops import", src)
    mod = types.ModuleType(name)
    mod.__file__ = f"<git {rev} {relpath}>"
    exec(compile(src, name + ".py", "exec"), mod.__dict__)
    return mod


def enc_kernel(mode: str, fixed_b: int, R: int, grid: int, slots, oslots):
    """mode: strip_x | strip_s | disp_s | dispodd_s."""
    dispatch = mode.startswith("disp")
    odd = mode == "dispodd_s"
    exact = mode.endswith("_x")

    def spread_b(w, fb):
        if fb == 8:
            return w
        return ((w & jnp.uint32(0xFF))
                | (((w >> 8) & jnp.uint32(0xFF)) << fb)
                | (((w >> 16) & jnp.uint32(0xFF)) << (2 * fb))
                | ((w >> 24) << (3 * fb)))

    def kernel(w_ref, lm_ref, rm_ref, *rest):
        if odd:
            fp_ref, bits_ref, out_ref, woff_ref = rest[:4]
            rest = rest[4:]
        else:
            bits_ref, out_ref, woff_ref = rest[:3]
            rest = rest[3:]
        if exact:
            stg_a, stg_b, sem_a, sem_b = rest
        else:
            carry, merged, sem = rest
        i = pl.program_id(0)
        w = w_ref[...].astype(jnp.uint32)
        o = w | (w >> 8)
        o = (o | (o >> 16)) & jnp.uint32(0xFF)
        wq = _word_widths_f32exp(o)
        b_fpr = _frame_widths_fpr_mxu(wq, 32)
        bits_ref[...] = b_fpr.astype(jnp.uint8)

        if not dispatch:
            fb = fixed_b
            pay = _uniform_place(_pack_groups_b(spread_b(w, fb), fb),
                                 fb, R, lm_ref[...], rm_ref[...], slots)
            Kr = fb * R // 8
            woff_ref[i] = i * Kr * LANES
            if exact:
                def body(stg, sem_x, pstg, psem):
                    @pl.when(i >= 2)
                    def _():
                        pltpu.make_async_copy(
                            stg.at[:Kr],
                            out_ref.at[pl.ds((i - 2) * Kr, Kr)],
                            sem_x).wait()
                    stg[...] = pay
                    pltpu.make_async_copy(
                        stg.at[:Kr], out_ref.at[pl.ds(i * Kr, Kr)],
                        sem_x).start()

                    @pl.when(i == grid - 1)
                    def _():
                        pltpu.make_async_copy(
                            stg.at[:Kr], out_ref.at[pl.ds(i * Kr, Kr)],
                            sem_x).wait()

                        @pl.when(i >= 1)
                        def _():
                            pltpu.make_async_copy(
                                pstg.at[:Kr],
                                out_ref.at[pl.ds((i - 1) * Kr, Kr)],
                                psem).wait()

                @pl.when(i % 2 == 0)
                def _():
                    body(stg_a, sem_a, stg_b, sem_b)

                @pl.when(i % 2 == 1)
                def _():
                    body(stg_b, sem_b, stg_a, sem_a)
            else:
                @pl.when(i > 0)
                def _():
                    pltpu.make_async_copy(
                        merged,
                        out_ref.at[pl.ds((i - 1) * Kr, R)], sem).wait()
                merged[...] = pay
                pltpu.make_async_copy(
                    merged, out_ref.at[pl.ds(i * Kr, R)], sem).start()

                @pl.when(i == grid - 1)
                def _():
                    pltpu.make_async_copy(
                        merged, out_ref.at[pl.ds(i * Kr, R)], sem).wait()
            return

        # dispatch arms: uniformity check + cursor carries + width
        # branches, strict single-staging emit of R rows at the cursor
        b0 = b_fpr[0, 0]
        uniform = jnp.logical_not(jnp.any(b_fpr != b0))

        @pl.when(i == 0)
        def _():
            carry[0] = 0
        woff_ref[i] = carry[0]
        out_row = carry[0] // LANES

        @pl.when(i > 0)
        def _():
            pltpu.make_async_copy(
                merged, out_ref.at[pl.ds(carry[1], R)], sem).wait()

        for fb in FAST_BS:
            @pl.when(uniform & (b0 == fb))
            def _(fb=fb):
                merged[...] = _uniform_place(
                    _pack_groups_b(spread_b(w, fb), fb), fb, R,
                    lm_ref[...], rm_ref[...], slots)
                carry[2] = jnp.int32(16 * fb * R)

        for fb in (ODD_BS if odd else ()):
            @pl.when(uniform & (b0 == fb))
            def _(fb=fb):
                merged[...] = _flat_place(
                    _pack_groups_b(spread_b(w, fb), fb), fb,
                    fp_ref[...], oslots)
                carry[2] = jnp.int32(16 * fb * R)

        pltpu.make_async_copy(
            merged, out_ref.at[pl.ds(out_row, R)], sem).start()
        carry[1] = out_row

        @pl.when(i == grid - 1)
        def _():
            pltpu.make_async_copy(
                merged, out_ref.at[pl.ds(out_row, R)], sem).wait()
        carry[0] = carry[0] + carry[2]
    return kernel


def make_enc(mode: str, fixed_b: int, R: int, nw: int, pad_rows: int):
    rows = nw // LANES
    grid = rows // R
    lm, rm, slots = _uniform_place_masks(R)
    fpw, oslots = _odd_place_masks(R)
    odd = mode == "dispodd_s"
    exact = mode.endswith("_x")

    in_specs = [
        pl.BlockSpec((R, LANES), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, LANES), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((R, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [jnp.asarray(lm), jnp.asarray(rm)]
    if odd:
        in_specs.append(pl.BlockSpec((fpw.shape[0], LANES),
                                     lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.asarray(fpw))
    if exact:
        scratch = [pltpu.VMEM((R, LANES), jnp.uint32),
                   pltpu.VMEM((R, LANES), jnp.uint32),
                   pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA]
    else:
        scratch = [pltpu.SMEM((3,), jnp.int32),
                   pltpu.VMEM((R, LANES), jnp.uint32),
                   pltpu.SemaphoreType.DMA]

    @jax.jit
    def f(words2d):
        return pl.pallas_call(
            enc_kernel(mode, fixed_b, R, grid, slots, oslots),
            grid=(grid,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((R, 4), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((rows, 4), jnp.uint8),
                jax.ShapeDtypeStruct((pad_rows, LANES), jnp.uint32),
                jax.ShapeDtypeStruct((grid,), jnp.int32),
            ],
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=_interp(),
        )(words2d, *args)
    return f


def gen(seed, n, kind):
    g = np.random.default_rng(seed)
    return (g.integers(0, 16, n, np.uint8) if kind == "w4"
            else g.integers(0, 256, n, np.uint8))


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
    old = load_old("fl_rl_compression_mpi_tpu/ops/fl_dense_pallas.py",
                   "fl_dense_old46")
    R = 8 if SMOKE else 256
    nd = (2 * R * LANES * 4 * 4) if SMOKE else (128 << 20)
    nwd = nd // 4
    rows = nwd // LANES
    chains = {}
    for kind in ("w4", "w8"):
        host = gen(11, nd, kind)
        fb = 4 if kind == "w4" else 8
        nf = jnp.int32(nd // 128)
        words = jax.device_put(jnp.asarray(host.view(np.uint32)))
        words2d = words.reshape(rows, LANES)
        pad_rows = rows + R + 32
        for mode in ("strip_x", "strip_s", "disp_s", "dispodd_s"):
            fenc = make_enc(mode, fb, R, nwd, pad_rows)

            def rt(w, fenc=fenc, nf=nf):
                b2, dense, woffs = fenc(w.reshape(rows, LANES))
                return old.fl_decode_dense_pallas(
                    dense, b2, woffs, nf).reshape(-1)[:nwd]

            @functools.partial(jax.jit, static_argnames=("k",))
            def chain(w, k, fn=rt):
                return jax.lax.fori_loop(0, k, lambda _, v: fn(v), w)

            o1 = np.asarray(jax.device_get(chain(words, 1)))
            ok = bool(np.array_equal(o1.view(np.uint8), host))
            print(f"{mode}_{kind} ok={ok}", flush=True)
            RESULTS[f"{mode}_{kind}_ok"] = ok
            if ok and not SMOKE:
                chains[f"{mode}_{kind}"] = (chain, words, 2 * nd, 6)

        if not SMOKE:
            def oo_rt(w, nf=nf):
                b2, dense, _, woffs = old.fl_encode_dense_pallas(w, nf)
                return old.fl_decode_dense_pallas(
                    dense.reshape(-1, 128), b2, woffs,
                    nf).reshape(-1)[:nwd]

            @functools.partial(jax.jit, static_argnames=("k",))
            def oo_chain(w, k, fn=oo_rt):
                return jax.lax.fori_loop(0, k, lambda _, v: fn(v), w)

            o1 = np.asarray(jax.device_get(oo_chain(words, 1)))
            ok = bool(np.array_equal(o1.view(np.uint8), host))
            print(f"oo_{kind} ok={ok}", flush=True)
            if ok:
                chains[f"oo_{kind}"] = (oo_chain, words, 2 * nd, 6)

    if SMOKE:
        print(json.dumps(RESULTS), flush=True)
        return
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
