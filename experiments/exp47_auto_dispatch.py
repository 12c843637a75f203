"""Round-3: speculative globally-uniform dispatch — chip A/B vs 6580aff.

new_* uses fl_encode_dense_auto / fl_decode_dense_auto (probe + stripped
single-width kernels + flagged fallback); old_* is the per-tile general
kernel at git HEAD.  The `miss` stream (uniform first half, mixed second)
prices the speculation-miss penalty (wasted fast pass + general re-run).

Changes under test (fl_dense_pallas.py): aligned-cursor branch skips
(encode cursor shift + carry-row reduce; decode window align shift),
static per-width spread in uniform branches (b=8 identity), uniformity
check on the compact (R,4) widths, b_lane MXU deferred to the general
branch.

Arms (same session, interleaved):
  old_*  — 82dcdc6 kernels (round-2 end, loaded via `git show`)
  new_*  — working tree
Streams (dense pair chains, 128 MiB): w4 (bench stream), w8, w3 (odd
fast path — also the ADVICE-r2 re-measurement, exp39 never got a valid
chip A/B), mixed (general network).

Plus a STAGE LADDER of compute-only kernels (parallel grid, no cursor
DMA) on the w4 stream attributing the remaining encode time:
  L0 read+write identity; L1 +widths (funnel+f32exp+MXU); L2 +bits
  store; L3 +spread+pack(b=4); L4 +uniform place; L5 ~full fast branch.

Usage: timeout 1700 python experiments/exp42_exact_emit_prod.py
SMOKE=1 runs interpret-mode parity on CPU.
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
    os.environ.setdefault("FLRL_DENSE_TILE_R", "8")
    os.environ.setdefault("FLRL_DENSE_DEC_TILE_R", "8")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fl_rl_compression_mpi_tpu.cli import _enable_compile_cache
from fl_rl_compression_mpi_tpu.ops import fl_dense_pallas, fl_numpy

_enable_compile_cache()
RESULTS = {}
CYCLES = 1 if SMOKE else 3
LANES = 128


def load_old(relpath, name, rev="6580aff"):
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


def gen(seed, n, kind):
    g = np.random.default_rng(seed)
    if kind == "w1":
        return np.zeros(n, np.uint8)
    if kind == "w3":
        return (g.integers(0, 4, n) + 4).astype(np.uint8)
    if kind == "w4":
        return g.integers(0, 16, n, np.uint8)
    if kind == "w8":
        return g.integers(0, 256, n, np.uint8)
    if kind == "miss":                     # speculation miss: uniform
        half = n // 2                      # first half, mixed second
        a = g.integers(0, 16, half, np.uint8)
        b = gen(seed + 1, n - half, "mixed")
        return np.concatenate([a, b])
    if kind == "mixed":                    # per-frame random widths 1..8
        fr = -(-n // 128)
        b = g.integers(0, 256, fr * 128, np.uint8).reshape(fr, 128)
        wf = g.integers(1, 9, fr)
        b &= ((1 << wf) - 1).astype(np.uint8)[:, None]
        b[:, 0] = (1 << (wf - 1)).astype(np.uint8)
        return b.reshape(-1)[:n].copy()
    raise ValueError(kind)


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


# ---------------------------------------------------------------------------
# Stage ladder: compute-only kernels, parallel grid, (R,128) in -> out.
# ---------------------------------------------------------------------------

def ladder_kernel(stage: int, R: int, slots, lm, rm):
    from fl_rl_compression_mpi_tpu.ops.fl_dense_pallas import (
        _pack_groups_b, _uniform_place)
    from fl_rl_compression_mpi_tpu.ops.fl_pallas import (
        _frame_widths_fpr_mxu, _word_widths_f32exp)

    def kernel(w_ref, lm_ref, rm_ref, out_ref, bits_ref):
        w = w_ref[...].astype(jnp.uint32)
        if stage == 0:
            out_ref[...] = w + jnp.uint32(1)
            bits_ref[...] = jnp.zeros_like(bits_ref)
            return
        o = w | (w >> 8)
        o = (o | (o >> 16)) & jnp.uint32(0xFF)
        wq = _word_widths_f32exp(o)
        b_fpr = _frame_widths_fpr_mxu(wq, 32)
        if stage >= 2:
            bits_ref[...] = b_fpr.astype(jnp.uint8)
        else:
            bits_ref[...] = jnp.zeros_like(bits_ref)
        if stage == 1 or stage == 2:
            out_ref[...] = w + b_fpr[0, 0].astype(jnp.uint32)
            return
        fb = 4
        sp = ((w & jnp.uint32(0xFF))
              | (((w >> 8) & jnp.uint32(0xFF)) << fb)
              | (((w >> 16) & jnp.uint32(0xFF)) << (2 * fb))
              | ((w >> 24) << (3 * fb)))
        pk = _pack_groups_b(sp, fb)
        if stage == 3:
            out_ref[...] = pk
            return
        pay = _uniform_place(pk, fb, R, lm_ref[...], rm_ref[...], slots)
        if stage == 4:
            out_ref[...] = pay
            return
        # stage 5: + uniformity check & a cheap finish-analog select
        b0 = b_fpr[0, 0]
        uniform = jnp.logical_not(jnp.any(b_fpr != b0))
        out_ref[...] = jnp.where(uniform, pay, w)
    return kernel


def run_ladder(nd: int, host: np.ndarray):
    from fl_rl_compression_mpi_tpu.ops.fl_dense_pallas import (
        _uniform_place_masks)
    R = 256
    rows = nd // 4 // LANES
    lm, rm, slots = _uniform_place_masks(R)
    words = jax.device_put(
        jnp.asarray(host.view(np.uint32).reshape(rows, LANES)))
    lmj, rmj = jnp.asarray(lm), jnp.asarray(rm)
    for stage in range(6):
        f = pl.pallas_call(
            ladder_kernel(stage, R, slots, lm, rm),
            grid=(rows // R,),
            in_specs=[
                pl.BlockSpec((R, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((R, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 4), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((rows, LANES), jnp.uint32),
                jax.ShapeDtypeStruct((rows, 4), jnp.uint8),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(w, k, f=f):
            def step(_, v):
                o, _b = f(v, lmj, rmj)
                return o
            return jax.lax.fori_loop(0, k, step, w)

        try:
            t = time_chain(chain, words, inner=12, reps=3)
            us = t / (rows // R) * 1e6
            RESULTS.setdefault("ladder_us_per_tile", []).append(
                round(us, 3))
            print(f"ladder L{stage}: {t*1e3:.3f} ms "
                  f"({us:.3f} us/tile, {2*nd/1e9/t:.1f} GB/s moved)",
                  flush=True)
        except Exception:
            print(f"ladder L{stage} FAILED "
                  f"{traceback.format_exc()[-300:]}", flush=True)


def main():
    # quick parity of the working tree (full battery lives in tests/)
    nb = ((1 << 20) if SMOKE else (4 << 20)) + 13
    allok = True
    for kind in ("w1", "w3", "w4", "w8", "mixed"):
        host = gen(3, nb, kind)
        R = fl_dense_pallas.DENSE_TILE_R
        tile_b = R * LANES * 4
        npad = -(-nb // tile_b) * tile_b
        buf = np.zeros(npad, np.uint8)
        buf[:nb] = host
        frames = -(-nb // 128)
        nf = jnp.int32(frames)
        bits2d, dense, total, woffs = \
            fl_dense_pallas.fl_encode_dense_pallas(
                jnp.asarray(buf.view(np.uint32)), nf)
        bg, vg = fl_numpy.encode(host)
        ok = (np.array_equal(np.asarray(bits2d).reshape(-1)[:frames], bg)
              and np.array_equal(
                  np.asarray(dense).view(np.uint8)[:vg.size], vg))
        out = fl_dense_pallas.fl_decode_dense_pallas(
            np.asarray(dense).reshape(-1, 128), bits2d, woffs, nf)
        ok &= np.array_equal(
            np.asarray(out).reshape(-1).view(np.uint8)[:nb], host)
        if not ok:
            print(f"parity FAIL {kind}", flush=True)
        allok &= bool(ok)
    RESULTS["parity_new"] = bool(allok)
    print(f"parity_new={allok}", flush=True)
    if SMOKE or not allok:
        print(json.dumps(RESULTS), flush=True)
        return

    old_dense = load_old(
        "fl_rl_compression_mpi_tpu/ops/fl_dense_pallas.py",
        "fl_dense_old")

    chains = {}
    nd = 128 << 20
    nwd = nd // 4
    for kind in ("w4", "w8", "w1", "mixed", "miss"):
        host = gen(11, nd, kind)
        words = jax.device_put(jnp.asarray(host.view(np.uint32)))
        nf = jnp.int32(nd // 128)
        for tag, mod in (("old", old_dense), ("new", fl_dense_pallas)):
            enc = (mod.fl_encode_dense_auto if tag == "new"
                   else mod.fl_encode_dense_pallas)
            dec = (mod.fl_decode_dense_auto if tag == "new"
                   else mod.fl_decode_dense_pallas)
            def dense_rt(w, enc=enc, dec=dec, nf=nf):
                b2, dense, _, woffs = enc(w, nf)
                return dec(dense.reshape(-1, 128), b2, woffs,
                           nf).reshape(-1)[:nwd]

            @functools.partial(jax.jit, static_argnames=("k",))
            def chain(w, k, fn=dense_rt):
                return jax.lax.fori_loop(0, k, lambda _, v: fn(v), w)

            o1 = np.asarray(jax.device_get(chain(words, 1)))
            ok = bool(np.array_equal(o1.view(np.uint8), host))
            RESULTS[f"{tag}_dense_{kind}_ok"] = ok
            print(f"{tag}_dense_{kind} ok={ok}", flush=True)
            if ok:
                chains[f"{tag}_dense_{kind}"] = (chain, words, 2 * nd, 6)

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
