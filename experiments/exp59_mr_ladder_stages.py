"""Round-5: stage ladder of the SHIPPED multi-ref uniform config — the
closing arithmetic for the mid-width uniform plateau (the analog of
exp40/exp43's ladders for the general kernel).

Encode variants at the production config, each chained with the
PRODUCTION decode (constant across arms, so pair deltas attribute the
encode-side stage marginals):

  L0  identity: read Rb rows/block, store w[:Kb]      (traffic floor)
  L1  + widths compute + bits store + flag
  L2  + spread + pack (payload = packed, unplaced)
  L3  + placement ladder             (== production compute)

L0-L2 payloads are NOT valid containers (the chain is a serialized
timing skeleton, garbage-tolerant by construction: uniform decode is
static-blocked, data-independent compute); L3 is parity+golden checked
against production.

Usage: timeout 1680 python experiments/exp59_mr_ladder_stages.py
       SMOKE=1 ... (CPU interpret compile check only)
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SMOKE = bool(int(os.environ.get("SMOKE", "0")))
if SMOKE:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fl_rl_compression_mpi_tpu.cli import _enable_compile_cache
from fl_rl_compression_mpi_tpu.ops import fl_dense_pallas as dp
from fl_rl_compression_mpi_tpu.ops import fl_numpy

_enable_compile_cache()

SZ = (1 << 21) if SMOKE else (128 << 20)
CYCLES = 1 if SMOKE else 3
LAT = 0.05
LANES = dp.LANES

FB, R, NREF = (4, 32, 2) if SMOKE else tuple(
    int(x) for x in os.environ.get("ARM", "4:2048:8").split(":"))


def time_chain(chain, w, inner, reps=3):
    jax.device_get(chain(w, 1).ravel()[-1])
    jax.device_get(chain(w, 1 + inner).ravel()[-1])
    ts, tds = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(chain(w, 1).ravel()[-1])
        t1 = time.perf_counter()
        jax.device_get(chain(w, 1 + inner).ravel()[-1])
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / inner)
        tds.append((t2 - t1 - LAT) / (1 + inner))
    return max(float(np.median(ts)), float(np.median(tds)), 1e-9)


def _enc_kernel_staged(fb, R, P, slots, stage):
    Rb = R // P
    Kb = fb * Rb // 8

    def kernel(*refs):
        nf_ref = refs[0]
        ins = refs[1:1 + P]
        lm_ref, rm_ref = refs[1 + P], refs[2 + P]
        bits_ref, out_ref, flag_ref = refs[3 + P:6 + P]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            flag_ref[0] = 0

        bits_parts, outs = [], []
        bad = jnp.zeros((), jnp.bool_)
        for k in range(P):
            w = ins[k][...].astype(jnp.uint32)
            if stage >= 1:
                o = w | (w >> 8)
                o = (o | (o >> 16)) & jnp.uint32(0xFF)
                wq = dp._word_widths_f32exp(o)
                b_fpr = dp._frame_widths_fpr_mxu(wq, 32)
                bits_parts.append(b_fpr.astype(jnp.uint8))
                fmask = (dp._iota((Rb, 4), 0) * 4 + dp._iota((Rb, 4), 1)
                         + (i * P + k) * Rb * 4) < nf_ref[0]
                bad = bad | jnp.any((b_fpr != fb) & fmask)
            else:
                bits_parts.append(jnp.zeros((Rb, 4), jnp.uint8))
            pay = w
            if stage >= 2 and fb != 8:
                sp = ((w & jnp.uint32(0xFF))
                      | (((w >> 8) & jnp.uint32(0xFF)) << fb)
                      | (((w >> 16) & jnp.uint32(0xFF)) << (2 * fb))
                      | ((w >> 24) << (3 * fb)))
                pay = dp._pack_groups_b(sp, fb)
            if stage >= 3 and fb != 8:
                pay = dp._uniform_place(pay, fb, Rb, lm_ref[...],
                                        rm_ref[...], slots)
            outs.append(pay[:Kb])
        flag_ref[0] = flag_ref[0] | bad.astype(jnp.int32)
        bits_ref[...] = jnp.concatenate(bits_parts, axis=0)
        out_ref[...] = jnp.concatenate(outs, axis=0)
    return kernel


@functools.partial(jax.jit, static_argnames=("fb", "tile_r", "nref",
                                              "stage"))
def enc_staged(words, n_frames, fb, tile_r, nref, stage):
    R = tile_r
    nw = words.shape[0]
    grid = nw // (R * LANES)
    rows = nw // LANES
    Rb = R // nref
    Kb = fb * Rb // 8
    lw, rw, slots = dp._uniform_place_masks(Rb)
    w2d = words.reshape(rows, LANES)
    bits2d, dense, flag = pl.pallas_call(
        _enc_kernel_staged(fb, R, nref, slots, stage),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec((Rb, LANES), lambda i, k=k: (nref * i + k, 0),
                        memory_space=pltpu.VMEM)
           for k in range(nref)]
        + [pl.BlockSpec((1, LANES), lambda i: (0, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((Rb, rw.shape[1]), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((R, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nref * Kb, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, 4), jnp.uint8),
            jax.ShapeDtypeStruct((rows * fb // 8
                                  + dp._dense_pad_rows(R), LANES),
                                 jnp.uint32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=dp._interpret(),
    )(jnp.asarray(n_frames, jnp.int32).reshape(1), *((w2d,) * nref),
      jnp.asarray(lw), jnp.asarray(rw))
    return bits2d, dense, flag[0]


def main():
    n = SZ
    fb, R, nref = FB, globals()["R"], NREF
    align = R * 512
    npad = -(-n // align) * align
    rows = npad // 512
    nfr = -(-n // 128)
    nf = jnp.int32(nfr)
    rng = np.random.default_rng(0)
    lo = 1 << (fb - 1) if fb > 1 else 0
    data = rng.integers(lo, 1 << fb, npad).astype(np.uint8)
    data[::128] = np.uint8((1 << fb) - 1)
    data[n:] = 0
    wd = jax.device_put(jnp.asarray(data.view(np.uint32)))
    results = []

    def emit(row):
        results.append(row)
        print(json.dumps(row), flush=True)

    # L3 must equal production bytes (golden)
    bg, vg = fl_numpy.encode(data[:n])
    try:
        b3, d3, f3 = enc_staged(wd, nf, fb, R, nref, 3)
    except Exception as e:
        emit({"exp": 59, "error": type(e).__name__, "msg": str(e)[:300]})
        return
    ok = (bool(np.array_equal(
              np.asarray(jax.device_get(b3)).reshape(-1)[:bg.size], bg))
          and bool(np.array_equal(
              np.ascontiguousarray(np.asarray(
                  jax.device_get(d3))).reshape(-1).view(
                      np.uint8)[: vg.size], vg))
          and int(jax.device_get(f3)) == 0)
    emit({"exp": 59, "fb": fb, "R": R, "nref": nref, "L3_golden": ok})
    if SMOKE:
        for st in (0, 1, 2):
            enc_staged(wd, nf, fb, R, nref, st)   # compile check
        sys.exit(0 if ok else 1)
    if not ok:
        return

    def mk_chain(stage):
        def rt(w):
            if stage == "prod":
                b2, dense, fl = dp.fl_encode_dense_uniform_pallas(
                    w, nf, fb, tile_r=R, nref=nref)
            else:
                b2, dense, fl = enc_staged(wd if False else w, nf, fb,
                                           R, nref, stage)
            return dp.fl_decode_dense_uniform_pallas(
                dense, fb, rows, tile_r=R, nref=nref).reshape(-1)

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(w, k):
            return jax.lax.fori_loop(0, k, lambda _, v: rt(v), w)
        return chain

    chains = {s: mk_chain(s) for s in (0, 1, 2, 3, "prod")}
    inner = {}
    for s, ch in chains.items():
        t1 = time_chain(ch, wd, inner=2, reps=1)
        inner[s] = max(6, min(96, int(0.4 / t1)))
    for cyc in range(CYCLES):
        for s, ch in chains.items():
            t = time_chain(ch, wd, inner[s])
            emit({"exp": 59, "cycle": cyc, "stage": str(s),
                  "pair_gbps": round(2 * n / 1e9 / t, 1),
                  "enc_us_per_tile": round(
                      t / (rows / R) * 1e6, 3)})

    with open("/tmp/exp59.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
