"""Round-4b: price MULTI-REF BlockSpec stride absorption for the
stripped single-width kernels (the round-5 lever named in
ROUND4_NOTES).

Idea: the uniform-w4 placement ladder spends log2(R/2) stride-row
rounds moving live rows 2r -> r across the whole R-row tile.  If the
kernel instead reads its input as P separate BlockSpec refs of R/P
rows (index maps absorb the block-level placement), each block only
needs a log2(R/(2P))-round in-block deinterleave — at P=8, R=1024:
lane 4 + merge 1 + stride 6 = 11 rounds vs the production 14.  Paper
estimate: ~5-10% on the w4 pair; the DMA cost of 8 smaller streams is
the unknown this experiment prices.

Variants (fb=4, 128 MiB pairs, 3 interleaved cycles, parity + golden):
  prod      — production uniform chain (R=1024)
  p4        — 4 input refs x 256 rows (enc), 4 x 128-row dense refs (dec)
  p8        — 8 input refs x 128 rows (enc), 8 x  64-row dense refs (dec)

Usage: timeout 1700 python experiments/exp53_multiref_stride.py
       SMOKE=1 ... (CPU interpret parity only)
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fl_rl_compression_mpi_tpu.cli import _enable_compile_cache
from fl_rl_compression_mpi_tpu.ops import fl_dense_pallas as dp
from fl_rl_compression_mpi_tpu.ops import fl_numpy
from fl_rl_compression_mpi_tpu.ops.lanes import LANES

_enable_compile_cache()

SZ = (1 << 21) if SMOKE else (128 << 20)
CYCLES = 1 if SMOKE else 3
LAT = 0.05
FB = 4
R = 16 if SMOKE else 1024          # total rows per grid step


def _interpret():
    return jax.default_backend() != "tpu"


def mr_encode(words, P):
    """Multi-ref stripped w4 encode: grid step reads P refs of R/P rows,
    places each with the R/P-scale masks, emits the concatenated
    fronts ((R*FB/8, 128) per step)."""
    Rb = R // P                     # rows per ref
    Kb = FB * Rb // 8               # live front rows per ref
    nw = words.shape[0]
    assert nw % (R * LANES) == 0
    grid = nw // (R * LANES)
    rows = nw // LANES
    lw, rw, slots = dp._uniform_place_masks(Rb)
    assert slots is not None

    def kernel(*refs):
        ins = refs[:P]
        lm, rm = refs[P], refs[P + 1]
        out_ref = refs[P + 2]
        outs = []
        for k in range(P):
            w = ins[k][...].astype(jnp.uint32)
            sp = ((w & jnp.uint32(0xFF))
                  | (((w >> 8) & jnp.uint32(0xFF)) << FB)
                  | (((w >> 16) & jnp.uint32(0xFF)) << (2 * FB))
                  | ((w >> 24) << (3 * FB)))
            pk = dp._pack_groups_b(sp, FB)
            outs.append(dp._uniform_place(pk, FB, Rb, lm[...], rm[...],
                                          slots)[:Kb])
        out_ref[...] = jnp.concatenate(outs, axis=0)

    dense = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((Rb, LANES),
                               lambda i, k=k: (P * i + k, 0),
                               memory_space=pltpu.VMEM)
                  for k in range(P)]
        + [pl.BlockSpec((1, LANES), lambda i: (0, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((Rb, rw.shape[1]), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((P * Kb, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (rows * FB // 8 + dp._dense_pad_rows(R), LANES), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(*((words.reshape(rows, LANES),) * P),
      jnp.asarray(lw), jnp.asarray(rw))
    return dense


def mr_decode(dense, rows_out, P):
    """Multi-ref stripped w4 decode: P refs of (FB*R/(8P)) dense rows,
    each unplaced at the R/P scale -> (R, 128) output per step."""
    Rb = R // P
    Kb = FB * Rb // 8
    grid = rows_out // R
    lw, rw, slots = dp._uniform_unplace_masks(Rb)
    assert slots is not None

    def kernel(*refs):
        ins = refs[:P]
        lm, rm = refs[P], refs[P + 1]
        out_ref = refs[P + 2]
        mask = jnp.uint32((1 << FB) - 1)
        outs = []
        for k in range(P):
            y = jnp.concatenate(
                [ins[k][...].astype(jnp.uint32),
                 jnp.zeros((Rb - Kb, LANES), jnp.uint32)], axis=0)
            y = dp._uniform_unplace(y, FB, Rb, lm[...], rm[...], slots)
            f = dp._unpack_groups_b(y, FB)
            s1 = f >> FB
            s2 = s1 >> FB
            s3 = s2 >> FB
            outs.append((f & mask) | ((s1 & mask) << 8)
                        | ((s2 & mask) << 16) | ((s3 & mask) << 24))
        out_ref[...] = jnp.concatenate(outs, axis=0)

    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((Kb, LANES),
                               lambda i, k=k: (P * i + k, 0),
                               memory_space=pltpu.VMEM)
                  for k in range(P)]
        + [pl.BlockSpec((1, LANES), lambda i: (0, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((Rb, rw.shape[1]), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_out, LANES), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(*((dense,) * P), jnp.asarray(lw), jnp.asarray(rw))


def main():
    n = SZ
    align = R * 512
    npad = -(-n // align) * align
    rows = npad // 512
    nfr = -(-n // 128)
    nf = jnp.int32(nfr)
    rng = np.random.default_rng(0)
    data = rng.integers(0, 16, npad).astype(np.uint8)
    data.reshape(-1, 128)[:, 0] |= 8          # pin every frame at w4
    data[n:] = 0
    print("data ready", flush=True)
    bg, vg = fl_numpy.encode(data[:n])
    print("golden ready", flush=True)
    wd = jax.device_put(jnp.asarray(data.view(np.uint32)))
    print("device_put done", flush=True)
    results = []

    def emit(row):
        results.append(row)
        print(json.dumps(row), flush=True)

    def prod_chain():
        def rt(w):
            b2, dense, flag = dp.fl_encode_dense_uniform_pallas(
                w, nf, FB, tile_r=R)
            return dp.fl_decode_dense_uniform_pallas(
                dense, FB, rows, tile_r=R).reshape(-1)

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(w, k):
            return jax.lax.fori_loop(0, k, lambda _, v: rt(v), w)
        return chain

    def mr_chain(P):
        def rt(w):
            dense = mr_encode(w, P)
            return mr_decode(dense, rows, P).reshape(-1)

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(w, k):
            return jax.lax.fori_loop(0, k, lambda _, v: rt(v), w)
        return chain

    variants = {"prod": prod_chain()}
    PS = tuple(int(x) for x in os.environ.get("PS", "4,8").split(","))
    for P in ((2,) if SMOKE else PS):
        variants[f"p{P}"] = mr_chain(P)

    good = {}
    for vname, chain in variants.items():
        print("compiling", vname, flush=True)
        try:
            o1 = np.asarray(jax.device_get(chain(wd, 1)))
        except Exception as e:
            emit({"exp": 53, "variant": vname,
                  "error": type(e).__name__, "msg": str(e)[:200]})
            continue
        ok = bool(np.array_equal(o1.view(np.uint8)[:n], data[:n]))
        emit({"exp": 53, "variant": vname, "parity": ok})
        if ok:
            good[vname] = chain
    # golden: multi-ref encode bytes == fl_numpy values
    for P in ((2,) if SMOKE else PS):
        dmr = np.asarray(jax.device_get(mr_encode(wd, P)))
        gok = bool(np.array_equal(
            np.ascontiguousarray(dmr).reshape(-1).view(
                np.uint8)[: vg.size], vg))
        emit({"exp": 53, "check": f"golden-p{P}", "values_ok": gok})

    if SMOKE:
        return

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

    inner = {}
    for vname, chain in good.items():
        t1 = time_chain(chain, wd, inner=2, reps=1)
        inner[vname] = max(6, min(96, int(0.4 / t1)))
    for cyc in range(CYCLES):
        for vname, chain in good.items():
            t = time_chain(chain, wd, inner[vname])
            emit({"exp": 53, "cycle": cyc, "variant": vname,
                  "pair_gbps": round(2 * n / 1e9 / t, 1)})

    with open("/tmp/exp53.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
