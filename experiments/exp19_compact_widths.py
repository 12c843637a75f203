"""Round-2: compact widths layout for the FL field kernels.

The (rows, 4) u8 widths output costs the encode kernel ~90 GB/s (exp15:
the (4,1)-packed sub-byte store path), and the i32 (rows, 4) variant
moves the cost to the decode read side (2.5x).  Hypothesis: a COMPACT
(rows/32, 128) i32 layout — bits_c[g, l] = width of global frame
g*128 + l — fixes both sides:

  encode: one extra K=4 matmul (d[r,l] = b_fpr[r, l%4]), a 2-iota mask
    (keep lane l on row r iff l//4 == r%32), and a group-of-32-rows sum
    (reshape (R,128)->(R/32,32,128), sum axis 1 — contributions are
    disjoint, so the sum is exact placement).  Store is full-lane i32.
  decode: expand rows x32 (broadcast+reshape), rotate each row left by
    4*(r%32) (5 masked lane-roll rounds), then one (R,128)@(128,128)
    bf16 matmul broadcasts lane j//32... = segment widths.  Alt variant:
    ONE 2Dx3D dot_general with M[j,s,l] = (j == 4s + l//32) does the
    whole expansion on the MXU (may not lower — guarded).

Measures, all same-session @ 256 MiB: encode {u8 baseline, none ceiling,
c32}, decode {u8 baseline, c32roll, c32dot3}, chains {baseline, compact},
with bit-parity checks of every variant against the production kernels.

Usage: timeout 1700 python experiments/exp19_compact_widths.py
"""

import functools
import json
import os
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
SMOKE = bool(int(os.environ.get("FLRL_EXP19_SMOKE", "0")))


def fence(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[-1])


def timed(fn, reps=5, inner=8):
    out = fn()
    fence(out)

    def batch(k):
        t0 = time.perf_counter()
        for _ in range(k):
            o = fn()
        fence(o)
        return time.perf_counter() - t0

    ts = []
    for _ in range(reps):
        t1 = batch(1)
        t2 = batch(1 + inner)
        ts.append((t2 - t1) / inner)
    return out, max(float(np.median(ts)), 1e-9)


def attempt(name, fn):
    try:
        fn()
    except Exception:
        print(f"{name}: FAILED\n{traceback.format_exc()[-600:]}",
              flush=True)


N = (1 << 21) if SMOKE else (256 << 20)
g = np.random.default_rng(0)
HOST = g.integers(0, 16, N, np.uint8)
WORDS = jax.device_put(jnp.asarray(HOST.view(np.uint32)))
NROWS = (N // 4) // LANES
WPF = 32
FPR = 4
_iota = lambda s, d: jax.lax.broadcasted_iota(jnp.int32, s, d)


# ------------------------------------------------------- encode variants
def _spread(w, b_lane):
    m = jnp.uint32(1) << b_lane.astype(jnp.uint32)
    r = w >> 24
    r = r * m + ((w >> 16) & jnp.uint32(0xFF))
    r = r * m + ((w >> 8) & jnp.uint32(0xFF))
    return r * m + (w & jnp.uint32(0xFF))


def _widths(w):
    o = w | (w >> 8)
    o = (o | (o >> 16)) & jnp.uint32(0xFF)
    return _word_widths_f32exp(o)


def enc_variant(bits_mode, tile_r):
    """bits_mode: 'u8' | 'none' | 'c32'."""
    def kernel(w_ref, *outs):
        w = w_ref[...].astype(jnp.uint32)
        b_fpr, b_lane = _frame_widths_mxu(_widths(w), WPF)
        R = w_ref.shape[0]
        if bits_mode == "u8":
            outs[1][...] = b_fpr.astype(jnp.uint8)
        elif bits_mode == "c32":
            sel4 = (_iota((FPR, LANES), 0)
                    == _iota((FPR, LANES), 1) % FPR).astype(jnp.bfloat16)
            d = jnp.dot(b_fpr.astype(jnp.bfloat16), sel4,
                        preferred_element_type=jnp.float32).astype(
                            jnp.int32)
            keep = (_iota((R, LANES), 1) // FPR
                    == _iota((R, LANES), 0) % 32)
            c = jnp.where(keep, d, 0)
            outs[1][...] = c.reshape(R // 32, 32, LANES).sum(axis=1)
        outs[0][...] = _spread(w, b_lane)

    grid = NROWS // tile_r
    out_specs = [pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((NROWS, LANES), jnp.uint32)]
    if bits_mode == "u8":
        out_specs.append(pl.BlockSpec((tile_r, FPR), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((NROWS, FPR), jnp.uint8))
    elif bits_mode == "c32":
        out_specs.append(pl.BlockSpec((tile_r // 32, LANES),
                                      lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((NROWS // 32, LANES), jnp.int32))

    @jax.jit
    def go(w):
        return pl.pallas_call(
            kernel, grid=(grid,),
            in_specs=[pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=out_specs, out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=SMOKE,
        )(w.reshape(NROWS, LANES))
    return go


# ------------------------------------------------------- decode variants
def _unpack(f, b):
    b = b.astype(jnp.uint32)
    mask = (jnp.uint32(1) << b) - jnp.uint32(1)
    s1 = f >> b
    s2 = s1 >> b
    s3 = s2 >> b
    return ((f & mask) | ((s1 & mask) << 8)
            | ((s2 & mask) << 16) | ((s3 & mask) << 24))


def dec_variant(mode, tile_r):
    """mode: 'u8' | 'c32roll' | 'c32dot3'."""
    def kernel(f_ref, bits_ref, out_ref):
        f = f_ref[...].astype(jnp.uint32)
        R = f_ref.shape[0]
        if mode == "u8":
            b4 = bits_ref[...].astype(jnp.int32).astype(jnp.bfloat16)
            selT = (_iota((FPR, LANES), 0)
                    == _iota((FPR, LANES), 1) // WPF).astype(jnp.bfloat16)
            b = jnp.dot(b4, selT,
                        preferred_element_type=jnp.float32).astype(
                            jnp.int32)
        elif mode == "c32roll":
            bc = bits_ref[...]
            t = jnp.broadcast_to(bc[:, None, :],
                                 (R // 32, 32, LANES)).reshape(R, LANES)
            a2 = (-(FPR * (_iota((R, LANES), 0) % 32))) & 127
            for k in (4, 8, 16, 32, 64):
                t = jnp.where((a2 & k) != 0, pltpu.roll(t, k, 1), t)
            selB = (_iota((LANES, LANES), 0)
                    == _iota((LANES, LANES), 1) // WPF
                    ).astype(jnp.bfloat16)
            b = jnp.dot(t.astype(jnp.bfloat16), selB,
                        preferred_element_type=jnp.float32).astype(
                            jnp.int32)
        else:  # c32dot3
            bc = bits_ref[...].astype(jnp.bfloat16)
            M = (_iota((LANES, 32, LANES), 0)
                 == FPR * _iota((LANES, 32, LANES), 1)
                 + _iota((LANES, 32, LANES), 2) // WPF
                 ).astype(jnp.bfloat16)
            b3 = jax.lax.dot_general(
                bc, M, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            b = b3.reshape(R, LANES).astype(jnp.int32)
        out_ref[...] = _unpack(f, b)

    grid = NROWS // tile_r
    if mode == "u8":
        bspec = pl.BlockSpec((tile_r, FPR), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    else:
        bspec = pl.BlockSpec((tile_r // 32, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)

    @jax.jit
    def go(fields, bits):
        return pl.pallas_call(
            kernel, grid=(grid,),
            in_specs=[
                pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                bspec,
            ],
            out_specs=pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NROWS, LANES), jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=SMOKE,
        )(fields.reshape(NROWS, LANES), bits)
    return go


GOLD = {}


def run_enc():
    for mode in ("u8", "none", "c32"):
        for tr in ((256,) if SMOKE else (1024, 2048)):
            try:
                go = enc_variant(mode, tr)
                out, t = timed(lambda: go(WORDS))
            except Exception:
                print(f"enc {mode}@{tr}: FAILED "
                      f"{traceback.format_exc()[-300:]}", flush=True)
                continue
            RESULTS[f"enc_{mode}_{tr}_gbps"] = round(N / 1e9 / t, 1)
            print(f"encode widths={mode} tile={tr}: {N/1e9/t:.1f} GB/s",
                  flush=True)
            if mode == "u8" and "bits_u8" not in GOLD:
                GOLD["fields"] = out[0]
                GOLD["bits_u8"] = out[1]
                GOLD["bits_flat"] = np.asarray(
                    jax.device_get(out[1])).reshape(-1)
            elif mode == "c32" and "bits_c32" not in GOLD:
                GOLD["bits_c32"] = out[1]
                bc = np.asarray(jax.device_get(out[1])).reshape(-1)
                ok = (np.array_equal(bc, GOLD["bits_flat"].astype(np.int64)
                                     .astype(np.int32))
                      and np.array_equal(
                          np.asarray(jax.device_get(out[0]))[:8192],
                          np.asarray(jax.device_get(GOLD["fields"]))
                          [:8192]))
                RESULTS["enc_c32_parity"] = bool(ok)
                print(f"enc c32 parity: {ok}", flush=True)


def run_dec():
    if "fields" not in GOLD:
        return
    fields, bits_u8, bits_c32 = (GOLD["fields"], GOLD["bits_u8"],
                                 GOLD["bits_c32"])
    ref = None
    for mode, bits in (("u8", bits_u8), ("c32roll", bits_c32),
                       ("c32dot3", bits_c32)):
        for tr in ((256,) if SMOKE else (512, 1024)):
            try:
                dgo = dec_variant(mode, tr)
                out, t = timed(lambda: dgo(fields, bits))
            except Exception:
                print(f"dec {mode}@{tr}: FAILED "
                      f"{traceback.format_exc()[-300:]}", flush=True)
                continue
            RESULTS[f"dec_{mode}_{tr}_gbps"] = round(N / 1e9 / t, 1)
            print(f"decode widths={mode} tile={tr}: {N/1e9/t:.1f} GB/s",
                  flush=True)
            sl = np.asarray(jax.device_get(out[:8192]))
            if ref is None:
                ref = sl
                RESULTS["dec_roundtrip_ok"] = bool(np.array_equal(
                    sl.reshape(-1).view(np.uint8), HOST[: sl.size * 4]))
            else:
                RESULTS[f"dec_{mode}_{tr}_match"] = bool(
                    np.array_equal(sl, ref))


def time_chain(chain, inner=24, reps=5):
    jax.device_get(chain(WORDS, 1).ravel()[-1])
    jax.device_get(chain(WORDS, 1 + inner).ravel()[-1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(chain(WORDS, 1).ravel()[-1])
        t1 = time.perf_counter()
        jax.device_get(chain(WORDS, 1 + inner).ravel()[-1])
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / inner)
    return max(float(np.median(ts)), 1e-9)


def run_chain():
    combos = [("c32", "c32", "c32roll", 256, 256)] if SMOKE else [
        ("base", "u8", "u8", 2048, 1024),
        ("base", "u8", "u8", 2048, 512),
        ("c32", "c32", "c32roll", 2048, 1024),
        ("c32", "c32", "c32roll", 2048, 512),
        ("c32", "c32", "c32roll", 1024, 1024),
        ("c32d3", "c32", "c32dot3", 2048, 1024),
    ]
    for name, em, dm, et, dt in combos:
        try:
            ego = enc_variant(em, et)
            dgo = dec_variant(dm, dt)

            def roundtrip(_, w, ego=ego, dgo=dgo):
                f, b = ego(w.reshape(NROWS, LANES))
                return dgo(f, b).reshape(-1)

            @functools.partial(jax.jit, static_argnames=("k",))
            def chain(w, k, roundtrip=roundtrip):
                return jax.lax.fori_loop(0, k, roundtrip, w.reshape(-1))

            t = time_chain(chain)
        except Exception:
            print(f"chain {name} {et}/{dt}: FAILED "
                  f"{traceback.format_exc()[-300:]}", flush=True)
            continue
        RESULTS[f"chain_{name}_{et}_{dt}_gbps"] = round(2 * N / 1e9 / t, 1)
        print(f"chain {name} {et}/{dt}: {2*N/1e9/t:.1f} GB/s", flush=True)


# ---------------------------------------------------- ceiling diagnostics
def copy_call(tile_r, nrows, bufs=None):
    pm = pl.Buffered(buffer_count=bufs) if bufs else None
    grid = nrows // tile_r

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + jnp.uint32(1)

    def go(w):
        return pl.pallas_call(
            kernel, grid=(grid,),
            in_specs=[pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM,
                                   pipeline_mode=pm)],
            out_specs=pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM,
                                   pipeline_mode=pm),
            out_shape=jax.ShapeDtypeStruct((nrows, LANES), jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=SMOKE,
        )(w.reshape(nrows, LANES))
    return go


def chain_of(step, words, nbytes, inner=24, reps=5):
    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(w, k):
        return jax.lax.fori_loop(0, k, lambda _, v: step(v), w)

    jax.device_get(chain(words, 1).ravel()[-1])
    jax.device_get(chain(words, 1 + inner).ravel()[-1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(chain(words, 1).ravel()[-1])
        t1 = time.perf_counter()
        jax.device_get(chain(words, 1 + inner).ravel()[-1])
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / inner)
    return 2 * nbytes / 1e9 / max(float(np.median(ts)), 1e-9)


def run_ceiling():
    if SMOKE:
        return
    RESULTS["device_kind"] = jax.devices()[0].device_kind
    print(f"device: {RESULTS['device_kind']}", flush=True)

    # XLA's own elementwise streaming rate in the same chain harness
    r = chain_of(lambda v: (v + jnp.uint32(1)) ^ jnp.uint32(3),
                 WORDS, N)
    RESULTS["ceil_xla_gbps"] = round(r, 1)
    print(f"ceiling XLA elementwise chain: {r:.1f} GB/s", flush=True)

    # pallas copy pairs: default double-buffering vs deeper buffering
    for bufs in (None, 3, 4):
        for tr in (1024, 2048):
            try:
                cp = copy_call(tr, NROWS, bufs)
                r = chain_of(lambda v, cp=cp: cp(cp(v).reshape(-1)
                                                 ).reshape(-1),
                             WORDS.reshape(-1), 2 * N)
            except Exception:
                print(f"copy bufs={bufs}@{tr}: FAILED "
                      f"{traceback.format_exc()[-300:]}", flush=True)
                continue
            RESULTS[f"ceil_copy_b{bufs or 2}_{tr}_gbps"] = round(r, 1)
            print(f"ceiling copy bufs={bufs or 2} tile={tr}: {r:.1f} GB/s",
                  flush=True)

    # does 512 MiB amortize fixed costs measurably?
    n2 = 512 << 20
    host2 = np.random.default_rng(7).integers(0, 16, n2, np.uint8)
    w2 = jax.device_put(jnp.asarray(host2.view(np.uint32)))
    nrows2 = (n2 // 4) // LANES
    try:
        cp = copy_call(2048, nrows2)
        r = chain_of(lambda v, cp=cp: cp(cp(v).reshape(-1)).reshape(-1),
                     w2.reshape(-1), 2 * n2, inner=12)
        RESULTS["ceil_copy512_2048_gbps"] = round(r, 1)
        print(f"ceiling copy 512MiB tile=2048: {r:.1f} GB/s", flush=True)
    except Exception:
        print(f"copy512: FAILED {traceback.format_exc()[-300:]}",
              flush=True)


if __name__ == "__main__":
    # (import-safe: exp20 reuses the variant builders without re-running)
    attempt("enc", run_enc)
    attempt("dec", run_dec)
    attempt("chain", run_chain)
    attempt("ceiling", run_ceiling)
    print(json.dumps(RESULTS), flush=True)
