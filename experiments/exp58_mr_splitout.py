"""Round-5: price SLICED STORES vs concatenate in the multi-ref
uniform kernels.

The production mr kernels build per-block results in a Python list and
``jnp.concatenate`` them before one full-ref store — potentially a
whole extra vector copy of the payload and bits per tile.  The
alternative writes each block to a STATIC SLICE of the same output ref
(``out_ref[k·Kb:(k+1)·Kb] = pay``), which Mosaic supports directly.
If Mosaic already fuses the concatenate into the store, this is a
wash; if not, it is free bandwidth.  Byte-identical output either way.

A/B at the shipped configs (w4 2048/8, w2 2048/4, w1 2048/4), 128 MiB
production-shaped pairs, 3 interleaved cycles, parity + golden per
variant.

Usage: timeout 1680 python experiments/exp58_mr_splitout.py
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

ARMS = ([(4, 32, 2), (2, 32, 4)] if SMOKE else
        [tuple(int(x) for x in a.split(":")) for a in os.environ.get(
            "ARMS", "4:2048:8,2:2048:4,1:2048:4").split(",")])


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


def _enc_kernel_sliced(fb, R, P, slots):
    """Production _uniform_enc_kernel_mr with sliced stores instead of
    list + concatenate."""
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

        bad = jnp.zeros((), jnp.bool_)
        for k in range(P):
            w = ins[k][...].astype(jnp.uint32)
            o = w | (w >> 8)
            o = (o | (o >> 16)) & jnp.uint32(0xFF)
            wq = dp._word_widths_f32exp(o)
            b_fpr = dp._frame_widths_fpr_mxu(wq, 32)
            bits_ref[k * Rb:(k + 1) * Rb] = b_fpr.astype(jnp.uint8)
            fmask = (dp._iota((Rb, 4), 0) * 4 + dp._iota((Rb, 4), 1)
                     + (i * P + k) * Rb * 4) < nf_ref[0]
            bad = bad | jnp.any((b_fpr != fb) & fmask)
            if fb == 8:
                pay = w
            else:
                sp = ((w & jnp.uint32(0xFF))
                      | (((w >> 8) & jnp.uint32(0xFF)) << fb)
                      | (((w >> 16) & jnp.uint32(0xFF)) << (2 * fb))
                      | ((w >> 24) << (3 * fb)))
                pk = dp._pack_groups_b(sp, fb)
                pay = dp._uniform_place(pk, fb, Rb, lm_ref[...],
                                        rm_ref[...], slots)
            out_ref[k * Kb:(k + 1) * Kb] = pay[:Kb]
        flag_ref[0] = flag_ref[0] | bad.astype(jnp.int32)
    return kernel


def _dec_kernel_sliced(fb, R, P, slots):
    Rb = R // P
    Kb = fb * Rb // 8

    def kernel(*refs):
        ins = refs[:P]
        lm_ref, rm_ref = refs[P], refs[P + 1]
        out_ref = refs[P + 2]
        mask = jnp.uint32((1 << fb) - 1)
        for k in range(P):
            y = jnp.concatenate(
                [ins[k][...].astype(jnp.uint32),
                 jnp.zeros((Rb - Kb, LANES), jnp.uint32)], axis=0)
            y = dp._uniform_unplace(y, fb, Rb, lm_ref[...], rm_ref[...],
                                    slots)
            f = dp._unpack_groups_b(y, fb)
            s1 = f >> fb
            s2 = s1 >> fb
            s3 = s2 >> fb
            out_ref[k * Rb:(k + 1) * Rb] = (
                (f & mask) | ((s1 & mask) << 8)
                | ((s2 & mask) << 16) | ((s3 & mask) << 24))
    return kernel


@functools.partial(jax.jit, static_argnames=("fb", "tile_r", "nref"))
def enc_sliced(words, n_frames, fb, tile_r, nref):
    R = tile_r
    nw = words.shape[0]
    grid = nw // (R * LANES)
    rows = nw // LANES
    Rb = R // nref
    Kb = fb * Rb // 8
    lw, rw, slots = dp._uniform_place_masks(Rb)
    w2d = words.reshape(rows, LANES)
    bits2d, dense, flag = pl.pallas_call(
        _enc_kernel_sliced(fb, R, nref, slots),
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


@functools.partial(jax.jit, static_argnames=("fb", "rows_out", "tile_r",
                                              "nref"))
def dec_sliced(dense2d, fb, rows_out, tile_r, nref):
    R = tile_r
    grid = rows_out // R
    Kr = fb * R // 8
    Rb = R // nref
    Kb = fb * Rb // 8
    lw, rw, slots = dp._uniform_unplace_masks(Rb)
    need = grid * Kr
    src = dense2d[:need] if dense2d.shape[0] % Kb else dense2d
    return pl.pallas_call(
        _dec_kernel_sliced(fb, R, nref, slots),
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
    results = []

    def emit(row):
        results.append(row)
        print(json.dumps(row), flush=True)

    good = []
    for fb, R, nref in ARMS:
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
        bg, vg = fl_numpy.encode(data[:n])
        wd = jax.device_put(jnp.asarray(data.view(np.uint32)))

        print(f"compiling sliced fb={fb} R={R} nref={nref}", flush=True)
        try:
            b2, dense, flag = enc_sliced(wd, nf, fb, R, nref)
            out = dec_sliced(dense, fb, rows, R, nref)
        except Exception as e:
            emit({"exp": 58, "fb": fb, "R": R, "nref": nref,
                  "error": type(e).__name__, "msg": str(e)[:300]})
            continue
        ok = (bool(np.array_equal(
                  np.asarray(jax.device_get(b2)).reshape(-1)[:bg.size],
                  bg))
              and bool(np.array_equal(
                  np.ascontiguousarray(np.asarray(
                      jax.device_get(dense))).reshape(-1).view(
                          np.uint8)[: vg.size], vg))
              and bool(np.array_equal(
                  np.ascontiguousarray(np.asarray(
                      jax.device_get(out))).reshape(-1).view(
                          np.uint8)[:n], data[:n]))
              and int(jax.device_get(flag)) == 0)
        emit({"exp": 58, "fb": fb, "R": R, "nref": nref,
              "sliced_ok": ok})
        if ok:
            good.append((fb, R, nref, rows, nf, wd))

    if SMOKE:
        sys.exit(0 if len(good) == len(ARMS) else 1)

    def mk_chain(fb, R, nref, rows, nf, variant):
        def rt(w):
            if variant == "prod":
                b2, dense, fl = dp.fl_encode_dense_uniform_pallas(
                    w, nf, fb, tile_r=R, nref=nref)
                return dp.fl_decode_dense_uniform_pallas(
                    dense, fb, rows, tile_r=R, nref=nref).reshape(-1)
            b2, dense, fl = enc_sliced(w, nf, fb, R, nref)
            return dec_sliced(dense, fb, rows, R, nref).reshape(-1)

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(w, k):
            return jax.lax.fori_loop(0, k, lambda _, v: rt(v), w)
        return chain

    chains = {}
    for fb, R, nref, rows, nf, wd in good:
        for variant in ("prod", "sliced"):
            chains[(fb, R, nref, variant)] = (
                mk_chain(fb, R, nref, rows, nf, variant), wd)
    inner = {}
    for key, (ch, wd) in chains.items():
        t1 = time_chain(ch, wd, inner=2, reps=1)
        inner[key] = max(6, min(96, int(0.4 / t1)))
    for cyc in range(CYCLES):
        for key, (ch, wd) in chains.items():
            t = time_chain(ch, wd, inner[key])
            emit({"exp": 58, "cycle": cyc, "fb": key[0], "R": key[1],
                  "nref": key[2], "variant": key[3],
                  "pair_gbps": round(2 * n / 1e9 / t, 1)})

    with open("/tmp/exp58.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
