"""Round-5: DECODE-side stage ladder of the shipped multi-ref uniform
config (completes exp59's attribution: its L0 "skeleton" bundled the
full decode compute).

Decode variants chained with the PRODUCTION encode fixed across arms:

  D0  identity: read Kb rows/block, write Rb rows     (traffic floor)
  D1  + unplace ladder
  D2  + unpack + byte-spread                          (== production)

D0/D1 outputs are garbage (timing skeletons; static-blocked,
data-independent compute); D2 is parity-checked against production.

Usage: timeout 1680 python experiments/exp60_mr_dec_stages.py
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

FB, TILE_R, NREF = (4, 32, 2) if SMOKE else tuple(
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


def _dec_kernel_staged(fb, R, P, slots, stage):
    Rb = R // P
    Kb = fb * Rb // 8

    def kernel(*refs):
        ins = refs[:P]
        lm_ref, rm_ref = refs[P], refs[P + 1]
        out_ref = refs[P + 2]
        mask = jnp.uint32((1 << fb) - 1)
        outs = []
        for k in range(P):
            y = jnp.concatenate(
                [ins[k][...].astype(jnp.uint32),
                 jnp.zeros((Rb - Kb, LANES), jnp.uint32)], axis=0)
            if stage >= 1:
                y = dp._uniform_unplace(y, fb, Rb, lm_ref[...],
                                        rm_ref[...], slots)
            if stage >= 2:
                f = dp._unpack_groups_b(y, fb)
                s1 = f >> fb
                s2 = s1 >> fb
                s3 = s2 >> fb
                y = ((f & mask) | ((s1 & mask) << 8)
                     | ((s2 & mask) << 16) | ((s3 & mask) << 24))
            outs.append(y)
        out_ref[...] = jnp.concatenate(outs, axis=0)
    return kernel


@functools.partial(jax.jit, static_argnames=("fb", "rows_out", "tile_r",
                                              "nref", "stage"))
def dec_staged(dense2d, fb, rows_out, tile_r, nref, stage):
    R = tile_r
    grid = rows_out // R
    Kr = fb * R // 8
    Rb = R // nref
    Kb = fb * Rb // 8
    lw, rw, slots = dp._uniform_unplace_masks(Rb)
    need = grid * Kr
    src = dense2d[:need] if dense2d.shape[0] % Kb else dense2d
    return pl.pallas_call(
        _dec_kernel_staged(fb, R, nref, slots, stage),
        grid=(grid,),
        in_specs=[pl.BlockSpec((Kb, LANES),
                               lambda i, k=k: (nref * i + k, 0),
                               memory_space=pltpu.VMEM)
                  for k in range(nref)]
        + [pl.BlockSpec((1, LANES), lambda i: (0, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((Rb, rw.shape[1]), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_out, LANES), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=dp._interpret(),
    )(*((src,) * nref), jnp.asarray(lw), jnp.asarray(rw))


def main():
    n = SZ
    fb, R, nref = FB, TILE_R, NREF
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

    try:
        b2, dense, flag = dp.fl_encode_dense_uniform_pallas(
            wd, nf, fb, tile_r=R, nref=nref)
        outp = dec_staged(dense, fb, rows, R, nref, 2)
    except Exception as e:
        emit({"exp": 60, "error": type(e).__name__, "msg": str(e)[:300]})
        return
    ok = bool(np.array_equal(
        np.ascontiguousarray(np.asarray(
            jax.device_get(outp))).reshape(-1).view(np.uint8)[:n],
        data[:n]))
    emit({"exp": 60, "fb": fb, "R": R, "nref": nref, "D2_parity": ok})
    if SMOKE:
        for st in (0, 1):
            dec_staged(dense, fb, rows, R, nref, st)
        sys.exit(0 if ok else 1)
    if not ok:
        return

    def mk_chain(stage):
        def rt(w):
            b2, dense, fl = dp.fl_encode_dense_uniform_pallas(
                w, nf, fb, tile_r=R, nref=nref)
            if stage == "prod":
                return dp.fl_decode_dense_uniform_pallas(
                    dense, fb, rows, tile_r=R, nref=nref).reshape(-1)
            return dec_staged(dense, fb, rows, R, nref,
                              stage).reshape(-1)

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(w, k):
            return jax.lax.fori_loop(0, k, lambda _, v: rt(v), w)
        return chain

    chains = {s: mk_chain(s) for s in (0, 1, 2, "prod")}
    inner = {}
    for s, ch in chains.items():
        t1 = time_chain(ch, wd, inner=2, reps=1)
        inner[s] = max(6, min(96, int(0.4 / t1)))
    for cyc in range(CYCLES):
        for s, ch in chains.items():
            t = time_chain(ch, wd, inner[s])
            emit({"exp": 60, "cycle": cyc, "stage": str(s),
                  "pair_gbps": round(2 * n / 1e9 / t, 1),
                  "us_per_tile_pair": round(t / (rows / R) * 1e6, 3)})

    with open("/tmp/exp60.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
