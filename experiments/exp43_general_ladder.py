"""Round-3: dense GENERAL path cost attribution (mixed-width tiles).

The general network runs ~26 GB/s pair (exp40/exp42) vs 75-90+ for the
uniform fast paths.  Stage ladder (compute-only kernels, parallel grid,
per-frame-random-width stream, R=256) attributes the encode cost:

  G0 identity; G1 +widths (funnel, f32exp, 2 MXU matmuls);
  G2 +variable Horner spread; G3 +_pack_groups (8-variant select-OR);
  G3b ALTERNATIVE pack: d-major with per-lane variable shifts (8 rolls,
      8 exp2-multiplies for left parts, 8 variable right shifts) — tests
      whether the measured "order of magnitude" variable-shift penalty
      beats the ~66-term select-OR sum;
  G4 +prefix_sum + route-word prep; G5 +compact_lsb2 (15 2-array rounds).

Usage: timeout 1700 python experiments/exp43_general_ladder.py
SMOKE=1 runs interpret-mode parity of G3b vs _pack_groups on CPU.
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
from fl_rl_compression_mpi_tpu.ops import lanes
from fl_rl_compression_mpi_tpu.ops.fl_dense_pallas import _pack_groups
from fl_rl_compression_mpi_tpu.ops.fl_pallas import (
    _b_lane_mxu, _frame_widths_fpr_mxu, _word_widths_f32exp)
from fl_rl_compression_mpi_tpu.ops.lanes import LANES, flat_idx

_enable_compile_cache()
RESULTS = {}
CYCLES = 1 if SMOKE else 3


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _pack_groups_dmajor(fields, b_lane):
    """d-major funnel pack: for each roll distance d = k − j ∈ [0, 7],
    ONE rolled copy contributes to out lane j (= lane8) from field
    k = j + d with left amount s = 4·b·k − 32·j when s ≥ 0, and the
    cross-word spill j' = j − ... is folded in as the s < 0 case via a
    variable right shift.  Validity: the (j, k) window overlap condition
    −4b < s < 32."""
    lane8 = _iota(fields.shape, 1) % 8
    out = jnp.zeros_like(fields)
    b = b_lane
    for d in range(8):
        src = fields if d == 0 else pltpu.roll(fields, LANES - d, 1)
        k = lane8 + d
        s = 4 * b * k - 32 * lane8
        valid = (k < 8) & (s < 32) & (s > -4 * b)
        sl = jnp.clip(s, 0, 31)
        # left part via exp2 multiply (exact; s is a multiple of 4 and
        # < 32, so 2^s <= 2^28 fits i32 — Mosaic has no f32->u32 cast)
        m = jax.lax.bitcast_convert_type(
            (sl + 127) << 23, jnp.float32).astype(jnp.int32).astype(
                jnp.uint32)
        left = fields_mul = src * m
        right = src >> jnp.clip(-s, 0, 31).astype(jnp.uint32)
        t = jnp.where(s >= 0, left, right)
        out = out | jnp.where(valid, t, jnp.uint32(0))
    return out


def parity_dmajor():
    g = np.random.default_rng(0)
    R = 64
    fr = R * LANES // 32
    wid = g.integers(1, 9, fr)
    b_lane = jnp.asarray(
        np.repeat(wid, 32).reshape(R, LANES).astype(np.int32))
    f = np.zeros((R, LANES), np.uint32)
    for i in range(fr):
        f.reshape(-1)[i * 32: (i + 1) * 32] = g.integers(
            0, 1 << min(int(4 * wid[i]), 31), 32)

    def run(fn):
        def k(f_ref, b_ref, o_ref):
            o_ref[...] = fn(f_ref[...], b_ref[...])
        return pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
            interpret=jax.default_backend() != "tpu",
        )(jnp.asarray(f), b_lane)

    a = np.asarray(run(_pack_groups))
    c = np.asarray(run(_pack_groups_dmajor))
    lane8 = np.arange(LANES) % 8
    live = lane8[None, :] < np.repeat(wid, 32).reshape(R, LANES)
    ok = np.array_equal(a[live], c[live])
    RESULTS["dmajor_parity"] = bool(ok)
    print(f"dmajor parity (live lanes): {ok}", flush=True)
    return ok


def ladder_kernel(stage: str, R: int):
    nbits = (R * LANES - 1).bit_length()

    def kernel(w_ref, out_ref):
        w = w_ref[...].astype(jnp.uint32)
        if stage == "G0":
            out_ref[...] = w + jnp.uint32(1)
            return
        o = w | (w >> 8)
        o = (o | (o >> 16)) & jnp.uint32(0xFF)
        wq = _word_widths_f32exp(o)
        b_fpr = _frame_widths_fpr_mxu(wq, 32)
        b_lane = _b_lane_mxu(b_fpr, 32)
        if stage == "G1":
            out_ref[...] = w + b_lane.astype(jnp.uint32)
            return
        m = jnp.uint32(1) << b_lane.astype(jnp.uint32)
        r = w >> 24
        r = r * m + ((w >> 16) & jnp.uint32(0xFF))
        r = r * m + ((w >> 8) & jnp.uint32(0xFF))
        fields = r * m + (w & jnp.uint32(0xFF))
        if stage == "G2":
            out_ref[...] = fields
            return
        if stage == "G3b":
            out_ref[...] = _pack_groups_dmajor(fields, b_lane)
            return
        packed = _pack_groups(fields, b_lane)
        if stage == "G3":
            out_ref[...] = packed
            return
        fidx = flat_idx(R)
        lane8 = _iota((R, LANES), 1) % 8
        live = lane8 < b_lane
        gb = jnp.where(lane8 == 0, b_lane, 0)
        incl = lanes.prefix_sum_flat(gb)
        egp = incl - b_lane
        dist = fidx - (egp + lane8)
        ctrl = jnp.where(live,
                         jnp.int32(lanes.LIVE)
                         | (dist << lanes.DIST_SHIFT), jnp.int32(0))
        if stage == "G4":
            out_ref[...] = packed + ctrl.astype(jnp.uint32)
            return
        ctrl, pay = lanes.compact_lsb2(ctrl, packed, nbits)
        out_ref[...] = pay + ctrl.astype(jnp.uint32)
    return kernel


def main():
    if not parity_dmajor():
        print(json.dumps(RESULTS), flush=True)
        return
    if SMOKE:
        print(json.dumps(RESULTS), flush=True)
        return

    nd = 128 << 20
    rows = nd // 4 // LANES
    R = 256
    g = np.random.default_rng(7)
    fr = nd // 128
    b = g.integers(0, 256, nd, np.uint8).reshape(fr, 128)
    wf = g.integers(1, 9, fr)
    b &= ((1 << wf) - 1).astype(np.uint8)[:, None]
    b[:, 0] = (1 << (wf - 1)).astype(np.uint8)
    words = jax.device_put(jnp.asarray(
        b.reshape(-1).view(np.uint32).reshape(rows, LANES)))

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

    for cyc in range(CYCLES):
        for stage in ("G0", "G1", "G2", "G3", "G3b", "G4", "G5"):
            f = pl.pallas_call(
                ladder_kernel(stage, R),
                grid=(rows // R,),
                in_specs=[pl.BlockSpec((R, LANES), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((R, LANES), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((rows, LANES),
                                               jnp.uint32),
            )

            @functools.partial(jax.jit, static_argnames=("k",))
            def chain(w, k, f=f):
                return jax.lax.fori_loop(0, k, lambda _, v: f(v), w)

            try:
                t = time_chain(chain, words, inner=8,
                               reps=(3 if cyc == 0 else 1))
                us = t / (rows // R) * 1e6
                RESULTS.setdefault(stage, []).append(round(us, 3))
                print(f"cycle {cyc} {stage}: {us:.3f} us/tile "
                      f"({2*nd/1e9/t:.1f} GB/s moved)", flush=True)
            except Exception:
                print(f"{stage}: FAILED "
                      f"{traceback.format_exc()[-300:]}", flush=True)

    print(json.dumps(RESULTS), flush=True)


try:
    main()
except Exception:
    print(f"MAIN FAILED\n{traceback.format_exc()[-800:]}", flush=True)
    print(json.dumps(RESULTS), flush=True)
