"""Round-2: break the serial ALU chains in the FL field kernels and A/B
on the CHAINED metric (the only reliable one), one session.

Variants:
  encode: Horner spread (3 serial multiplies) vs parallel spread
          (masks m, m2=m<<b, m3=m2<<b... all shifts of computed widths;
          3 independent multiplies + OR tree)
  decode: serial s1=f>>b; s2=s1>>b; s3=s2>>b vs parallel shifts by
          precomputed b, 2b, 3b
  tiles:  enc {2048, 3072} x dec {512, 1024, 2048}

Usage: timeout 1700 python experiments/exp16_chain_micro.py
"""

import functools
import itertools
import json
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
from fl_rl_compression_mpi_tpu.ops.fl_pallas import (
    LANES, _frame_widths_mxu, _word_widths_f32exp)

_enable_compile_cache()
RESULTS = {}

N = 256 << 20
g = np.random.default_rng(0)
HOST = g.integers(0, 16, N, np.uint8)
WORDS = jax.device_put(jnp.asarray(HOST.view(np.uint32)))
NROWS = (N // 4) // LANES
WPF = 32
FPR = 4


def enc_call(variant, tile_r):
    def kernel(w_ref, fields_ref, bits_ref):
        w = w_ref[...].astype(jnp.uint32)
        o = w | (w >> 8)
        o = (o | (o >> 16)) & jnp.uint32(0xFF)
        wq = _word_widths_f32exp(o)
        b_fpr, b_lane = _frame_widths_mxu(wq, WPF)
        bits_ref[...] = b_fpr.astype(jnp.uint8)
        bu = b_lane.astype(jnp.uint32)
        e0 = w & jnp.uint32(0xFF)
        e1 = (w >> 8) & jnp.uint32(0xFF)
        e2 = (w >> 16) & jnp.uint32(0xFF)
        e3 = w >> 24
        if variant == "horner":
            m = jnp.uint32(1) << bu
            r = e3
            r = r * m + e2
            r = r * m + e1
            fields_ref[...] = r * m + e0
        else:  # parallel
            m = jnp.uint32(1) << bu
            m2 = m << bu
            m3 = m2 << bu
            fields_ref[...] = e0 | (e1 * m) | (e2 * m2) | (e3 * m3)

    grid = NROWS // tile_r

    def go(w2d):
        return pl.pallas_call(
            kernel, grid=(grid,),
            in_specs=[pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_r, FPR), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((NROWS, LANES), jnp.uint32),
                jax.ShapeDtypeStruct((NROWS, FPR), jnp.uint8),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(w2d)
    return go


def dec_call(variant, tile_r):
    def kernel(f_ref, bits_ref, out_ref):
        f = f_ref[...].astype(jnp.uint32)
        b4 = bits_ref[...].astype(jnp.int32).astype(jnp.float32)
        selT = (jax.lax.broadcasted_iota(jnp.int32, (FPR, LANES), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (FPR, LANES), 1)
                // WPF).astype(jnp.float32)
        b = jnp.dot(b4, selT,
                    preferred_element_type=jnp.float32).astype(
                        jnp.int32).astype(jnp.uint32)
        mask = (jnp.uint32(1) << b) - jnp.uint32(1)
        if variant == "serial":
            s1 = f >> b
            s2 = s1 >> b
            s3 = s2 >> b
        else:  # parallel
            b2 = b + b
            s1 = f >> b
            s2 = f >> b2
            s3 = f >> (b2 + b)
        out_ref[...] = ((f & mask) | ((s1 & mask) << 8)
                        | ((s2 & mask) << 16) | ((s3 & mask) << 24))

    grid = NROWS // tile_r

    def go(fields2d, bits2d):
        return pl.pallas_call(
            kernel, grid=(grid,),
            in_specs=[
                pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_r, FPR), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NROWS, LANES), jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(fields2d, bits2d)
    return go


def chain_rate(ev, et, dv, dt, check=False):
    enc = enc_call(ev, et)
    dec = dec_call(dv, dt)

    def roundtrip(_, w2d):
        fields, bits = enc(w2d)
        return dec(fields, bits)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(w2d, k):
        return jax.lax.fori_loop(0, k, roundtrip, w2d)

    w2d = WORDS.reshape(NROWS, LANES)
    inner = 16
    out1 = chain(w2d, 1)
    jax.device_get(out1.ravel()[-1])
    if check:
        sl = np.asarray(jax.device_get(out1[:8192]))
        ok = np.array_equal(sl.reshape(-1).view(np.uint8),
                            HOST[: sl.size * 4])
        RESULTS[f"ok_{ev}_{dv}"] = bool(ok)
    jax.device_get(chain(w2d, 1 + inner).ravel()[-1])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(chain(w2d, 1).ravel()[-1])
        t1 = time.perf_counter()
        jax.device_get(chain(w2d, 1 + inner).ravel()[-1])
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / inner)
    return 2 * N / 1e9 / max(float(np.median(ts)), 1e-9)


combos = [
    ("horner", 2048, "serial", 1024),    # current production
    ("horner", 2048, "parallel", 1024),
    ("parallel", 2048, "serial", 1024),
    ("parallel", 2048, "parallel", 1024),
    ("parallel", 2048, "parallel", 2048),
    ("horner", 2048, "serial", 2048),
    ("horner", 3072, "serial", 1024),
    ("parallel", 3072, "parallel", 1024),
]
for ev, et, dv, dt in combos:
    try:
        r = chain_rate(ev, et, dv, dt, check=True)
        RESULTS[f"chain_{ev[:3]}{et}_{dv[:3]}{dt}"] = round(r, 1)
        print(f"chain enc={ev}@{et} dec={dv}@{dt}: {r:.1f} GB/s",
              flush=True)
    except Exception:
        print(f"chain {ev}@{et}/{dv}@{dt}: FAILED "
              f"{traceback.format_exc()[-300:]}", flush=True)

print(json.dumps(RESULTS), flush=True)
