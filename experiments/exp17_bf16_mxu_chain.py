"""Round-2: chain-level A/B of FL field-kernel variants (one chip session).

Hypothesis: the per-tile width matmuls run in f32 on the MXU with a
K=4-padded-to-128 contraction; at f32 MXU rate they cost ~2x the tile's
HBM time and are the real bottleneck.  bf16 operands (exact here: widths
are ints 1..8, the segment-max trick only needs the exponent field, and
bf16 has the same 8-bit exponent as f32) should cut MXU time ~4-8x.

Variants, all measured as the chained encode->decode fori_loop (the only
timing this platform reports honestly — FINDINGS.md):
  base    f32 matmuls, u8 (R,4) widths       (production today)
  bf16    bf16 matmuls, u8 widths
  bf16i32 bf16 matmuls, i32 widths
  nowid   no widths output, decode uses constant b=4 (ceiling probe —
          only correct on the uniform-4-bit bench data)
  big     bf16 @ enc tile 4096 (vmem_limit raised)

Usage: timeout 1700 python experiments/exp17_bf16_mxu_chain.py
"""

import functools
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
    LANES, _word_widths_f32exp)

_enable_compile_cache()
RESULTS = {}

N = 256 << 20
g = np.random.default_rng(0)
HOST = g.integers(0, 16, N, np.uint8)
WORDS = jax.device_put(jnp.asarray(HOST.view(np.uint32)))
NROWS = (N // 4) // LANES
WPF = 32
FPR = LANES // WPF
SPACING = 6


def _frame_widths(wq, dtype):
    """Per-frame width via exponent-sum segment max + broadcast-back, both
    as (R,128)@(128,4) / (R,4)@(4,128) matmuls in ``dtype`` operands."""
    v = jax.lax.bitcast_convert_type((SPACING * wq + 127) << 23,
                                     jnp.float32).astype(dtype)
    sel = (jax.lax.broadcasted_iota(jnp.int32, (LANES, FPR), 0) // WPF
           == jax.lax.broadcasted_iota(jnp.int32, (LANES, FPR), 1)
           ).astype(dtype)
    seg = jnp.dot(v, sel, preferred_element_type=jnp.float32)
    e = (jax.lax.bitcast_convert_type(seg, jnp.int32) >> 23) - 127
    b_fpr = e // SPACING
    selT = (jax.lax.broadcasted_iota(jnp.int32, (FPR, LANES), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (FPR, LANES), 1) // WPF
            ).astype(dtype)
    b_lane = jnp.dot(b_fpr.astype(dtype), selT,
                     preferred_element_type=jnp.float32).astype(jnp.int32)
    return b_fpr, b_lane


def make_encode(mm_dtype, bits_mode, tile_r, vmem_mb=None):
    def kernel(w_ref, *outs):
        w = w_ref[...].astype(jnp.uint32)
        o = w | (w >> 8)
        o = (o | (o >> 16)) & jnp.uint32(0xFF)
        wq = _word_widths_f32exp(o)
        b_fpr, b_lane = _frame_widths(wq, mm_dtype)
        if bits_mode == "u8":
            outs[1][...] = b_fpr.astype(jnp.uint8)
        elif bits_mode == "i32":
            outs[1][...] = b_fpr
        m = jnp.uint32(1) << b_lane.astype(jnp.uint32)
        r = w >> 24
        r = r * m + ((w >> 16) & jnp.uint32(0xFF))
        r = r * m + ((w >> 8) & jnp.uint32(0xFF))
        outs[0][...] = r * m + (w & jnp.uint32(0xFF))

    grid = NROWS // tile_r
    out_specs = [pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((NROWS, LANES), jnp.uint32)]
    if bits_mode != "none":
        dt = jnp.uint8 if bits_mode == "u8" else jnp.int32
        out_specs.append(pl.BlockSpec((tile_r, FPR), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((NROWS, FPR), dt))
    params = dict(dimension_semantics=("parallel",))
    if vmem_mb:
        params["vmem_limit_bytes"] = vmem_mb << 20

    def go(w):
        return pl.pallas_call(
            kernel, grid=(grid,),
            in_specs=[pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=out_specs, out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(**params),
        )(w.reshape(NROWS, LANES))
    return go


def make_decode(mm_dtype, bits_mode, tile_r, vmem_mb=None):
    def kernel(*refs):
        if bits_mode == "none":
            f_ref, out_ref = refs
            b = jnp.uint32(4)
            mask = jnp.uint32(0xF)
        else:
            f_ref, bits_ref, out_ref = refs
            b4 = bits_ref[...].astype(jnp.int32).astype(mm_dtype)
            selT = (jax.lax.broadcasted_iota(jnp.int32, (FPR, LANES), 0)
                    == jax.lax.broadcasted_iota(
                        jnp.int32, (FPR, LANES), 1) // WPF
                    ).astype(mm_dtype)
            b = jnp.dot(b4, selT,
                        preferred_element_type=jnp.float32).astype(
                            jnp.int32).astype(jnp.uint32)
            mask = (jnp.uint32(1) << b) - jnp.uint32(1)
        f = f_ref[...].astype(jnp.uint32)
        s1 = f >> b
        s2 = s1 >> b
        s3 = s2 >> b
        out_ref[...] = ((f & mask) | ((s1 & mask) << 8)
                        | ((s2 & mask) << 16) | ((s3 & mask) << 24))

    grid = NROWS // tile_r
    in_specs = [pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    if bits_mode != "none":
        in_specs.append(pl.BlockSpec((tile_r, FPR), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
    params = dict(dimension_semantics=("parallel",))
    if vmem_mb:
        params["vmem_limit_bytes"] = vmem_mb << 20

    def go(fields, *bits):
        return pl.pallas_call(
            kernel, grid=(grid,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NROWS, LANES), jnp.uint32),
            compiler_params=pltpu.CompilerParams(**params),
        )(fields.reshape(NROWS, LANES), *bits)
    return go


def time_chain(enc, dec, with_bits, reps=5, inner=24):
    def roundtrip(_, w):
        out = enc(w)
        if with_bits:
            f, b = out
            return dec(f, b).reshape(-1)
        return dec(out[0]).reshape(-1)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(w, k):
        return jax.lax.fori_loop(0, k, roundtrip, w)

    # parity: one roundtrip must be the identity (zero padding -> width-1
    # pad frames -> zero output)
    one = np.asarray(jax.device_get(chain(WORDS, 1)))
    ok = bool(np.array_equal(one.view(np.uint8), HOST))
    jax.device_get(chain(WORDS, 1 + inner).ravel()[-1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(chain(WORDS, 1).ravel()[-1])
        t1 = time.perf_counter()
        jax.device_get(chain(WORDS, 1 + inner).ravel()[-1])
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / inner)
    return ok, 2 * N / 1e9 / max(float(np.median(ts)), 1e-9)


VARIANTS = [
    # name, mm_dtype, bits_mode, enc_tile, dec_tile, vmem_mb
    ("base_2048_1024", jnp.float32, "u8", 2048, 1024, None),
    ("bf16_2048_1024", jnp.bfloat16, "u8", 2048, 1024, None),
    ("bf16_2048_512", jnp.bfloat16, "u8", 2048, 512, None),
    ("bf16i32_2048_1024", jnp.bfloat16, "i32", 2048, 1024, None),
    ("nowid_2048_1024", jnp.bfloat16, "none", 2048, 1024, None),
    ("bf16_4096_1024", jnp.bfloat16, "u8", 4096, 1024, 100),
    ("bf16_2048_2048", jnp.bfloat16, "u8", 2048, 2048, 100),
    ("base_2048_512", jnp.float32, "u8", 2048, 512, None),
]

for name, dt, bm, et, dtile, vm in VARIANTS:
    try:
        enc = make_encode(dt, bm, et, vm)
        dec = make_decode(dt, bm, dtile, vm)
        ok, gbps = time_chain(enc, dec, with_bits=(bm != "none"))
        RESULTS[f"chain_{name}"] = round(gbps, 1)
        RESULTS[f"ok_{name}"] = ok
        print(f"chain {name}: {gbps:.1f} GB/s ok={ok}", flush=True)
    except Exception:
        print(f"chain {name}: FAILED\n{traceback.format_exc()[-500:]}",
              flush=True)

print(json.dumps(RESULTS), flush=True)
