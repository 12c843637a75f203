"""Round-2 chip session #3: RL Pallas kernels + FL encode output variants.

exp7: decode hits 490 GB/s (tile 1024); encode stalls at 297 — the
(rows, 4)-u8 widths stream is the structural difference.  This session:
  a. FL encode ceiling without the widths output (variant D);
  b. FL encode with widths reshaped to full (rows/32, 128) tiles in-kernel
     (variant C) and as i32 (variant E);
  c. RL Pallas encode/decode on the BASELINE long-run config (256 MiB,
     mean run ~64) + the dense-runs worst case, with parity checks;
  d. decode tile 512 probe.

Usage: timeout 1700 python experiments/exp8_rl_and_enc_variants.py
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
from fl_rl_compression_mpi_tpu.ops import fl_pallas, rl_jax, rl_numpy, \
    rl_pallas
from fl_rl_compression_mpi_tpu.ops.fl_pallas import LANES, \
    _frame_widths_mxu, _word_widths_f32exp

_enable_compile_cache()

N = 256 << 20
RESULTS = {}


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


def gbps(t):
    return N / 1e9 / t


def attempt(name, fn):
    try:
        fn()
    except Exception:
        print(f"{name}: FAILED\n{traceback.format_exc()[-600:]}",
              flush=True)


rng = np.random.default_rng(0)
host = rng.integers(0, 16, N, np.uint8)
words = jax.device_put(jnp.asarray(host.view(np.uint32)))
nn = jnp.int32(N)
print("data staged", flush=True)

# -- a. encode variant D: no widths output ---------------------------------


def _enc_noout(wpf):
    def kernel(w_ref, fields_ref):
        w = w_ref[...].astype(jnp.uint32)
        o = w | (w >> 8)
        o = (o | (o >> 16)) & jnp.uint32(0xFF)
        wq = _word_widths_f32exp(o)
        b_fpr, b_lane = _frame_widths_mxu(wq, wpf)
        m = jnp.uint32(1) << b_lane.astype(jnp.uint32)
        r = w >> 24
        r = r * m + ((w >> 16) & jnp.uint32(0xFF))
        r = r * m + ((w >> 8) & jnp.uint32(0xFF))
        fields_ref[...] = r * m + (w & jnp.uint32(0xFF))
    return kernel


@functools.partial(jax.jit, static_argnames=("tile_r",))
def enc_d(x, tile_r=2048):
    nw = x.shape[0]
    return pl.pallas_call(
        _enc_noout(32),
        grid=(nw // (tile_r * LANES),),
        in_specs=[pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nw // LANES, LANES), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(x.reshape(nw // LANES, LANES))


def run_d():
    for tr in (1024, 2048):
        _, t = timed(lambda: enc_d(words, tile_r=tr))
        RESULTS[f"encD_tile{tr}"] = round(gbps(t), 1)
        print(f"encode-D (no widths) tile {tr}: {gbps(t):.1f}", flush=True)


attempt("encD", run_d)

# -- a'. encode variant C: widths reshaped to (rows/32, 128) ---------------


def _enc_reshape(wpf):
    def kernel(w_ref, fields_ref, bits_ref):
        w = w_ref[...].astype(jnp.uint32)
        o = w | (w >> 8)
        o = (o | (o >> 16)) & jnp.uint32(0xFF)
        wq = _word_widths_f32exp(o)
        b_fpr, b_lane = _frame_widths_mxu(wq, wpf)
        tr = b_fpr.shape[0]
        bits_ref[...] = b_fpr.reshape(tr // 32, 128).astype(jnp.uint8)
        m = jnp.uint32(1) << b_lane.astype(jnp.uint32)
        r = w >> 24
        r = r * m + ((w >> 16) & jnp.uint32(0xFF))
        r = r * m + ((w >> 8) & jnp.uint32(0xFF))
        fields_ref[...] = r * m + (w & jnp.uint32(0xFF))
    return kernel


@functools.partial(jax.jit, static_argnames=("tile_r",))
def enc_c(x, tile_r=2048):
    nw = x.shape[0]
    return pl.pallas_call(
        _enc_reshape(32),
        grid=(nw // (tile_r * LANES),),
        in_specs=[pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r // 32, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nw // LANES, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((nw // LANES // 32, LANES), jnp.uint8),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(x.reshape(nw // LANES, LANES))


def run_c():
    for tr in (1024, 2048):
        (f_c, b_c), t = timed(lambda: enc_c(words, tile_r=tr))
        RESULTS[f"encC_tile{tr}"] = round(gbps(t), 1)
        print(f"encode-C (reshaped widths) tile {tr}: {gbps(t):.1f}",
              flush=True)
    # parity vs current kernel
    b_cur, f_cur = fl_pallas.fl_encode_fields_pallas(words, nn)
    okf = bool(jnp.array_equal(f_c, f_cur))
    okb = bool(np.array_equal(np.asarray(jax.device_get(b_c)).reshape(-1),
                              np.asarray(jax.device_get(b_cur)).reshape(-1)))
    RESULTS["encC_ok"] = okf and okb
    print(f"encode-C parity fields={okf} bits={okb}", flush=True)


attempt("encC", run_c)

# -- d. decode tile 512 -----------------------------------------------------


def run_dec512():
    frames = N // 128
    bits_d, fields_d = fl_pallas.fl_encode_fields_pallas(words, nn)
    bits_h = np.asarray(jax.device_get(bits_d)).reshape(-1)[:frames]
    bits2d = jax.device_put(jnp.asarray(
        np.ascontiguousarray(bits_h).reshape(N // 4 // 128, 4)))
    for tr in (512, 1024):
        out_w, t = timed(lambda: fl_pallas.fl_decode_fields_pallas(
            fields_d, bits2d, nn, frame_length=128, tile_r=tr))
        RESULTS[f"dec_tile{tr}"] = round(gbps(t), 1)
        print(f"decode tile {tr}: {gbps(t):.1f}", flush=True)


attempt("dec512", run_dec512)

# -- c. RL kernels ----------------------------------------------------------


def rl_case(tag, data):
    n = data.size
    npad = -(-n // (1 << 20)) * (1 << 20)
    buf = np.zeros(npad, np.uint8)
    buf[:n] = data
    dev = jax.device_put(jnp.asarray(buf))
    nn2 = jnp.int32(n)

    enc, t_enc = timed(lambda: rl_jax.rl_encode_device(dev, nn2), reps=3,
                       inner=2)
    r = int(jax.device_get(enc.num_runs))
    RESULTS[f"rl_{tag}_encode_gbps"] = round(n / 1e9 / t_enc, 2)
    RESULTS[f"rl_{tag}_runs"] = r
    print(f"rl {tag}: encode {n/1e9/t_enc:.2f} GB/s ({r} runs)",
          flush=True)

    # parity on a slice pull (D2H is 0.007 GB/s — pull only the runs)
    cg, vg = rl_numpy.encode(data)
    ok = (r == cg.size)
    if ok and r:
        c_dev = np.asarray(jax.device_get(enc.counts[:r]))
        v_dev = np.asarray(jax.device_get(enc.values[:r]))
        ok = (np.array_equal(c_dev, cg) and np.array_equal(v_dev, vg))
    RESULTS[f"rl_{tag}_encode_ok"] = bool(ok)
    print(f"rl {tag}: encode parity {ok}", flush=True)

    out, t_dec = timed(
        lambda: rl_jax.rl_decode_device(enc.counts, enc.values,
                                        enc.num_runs, nn2, npad),
        reps=3, inner=2)
    RESULTS[f"rl_{tag}_decode_gbps"] = round(n / 1e9 / t_dec, 2)
    # spot parity: compare a 1 MiB slice
    sl = np.asarray(jax.device_get(out.reshape(-1)[:1 << 20]))
    RESULTS[f"rl_{tag}_decode_ok"] = bool(
        np.array_equal(sl, data[:1 << 20] if n >= 1 << 20 else buf[:1 << 20]))
    print(f"rl {tag}: decode {n/1e9/t_dec:.2f} GB/s "
          f"ok={RESULTS[f'rl_{tag}_decode_ok']}", flush=True)


def run_rl():
    n = N // 4                     # 64 MiB keeps parity-pull times sane
    nruns = n // 32
    g = np.random.default_rng(1)
    longrun = np.repeat(g.integers(0, 256, nruns, np.uint8),
                        g.integers(16, 112, nruns))[:n].copy()
    rl_case("longrun64m", longrun)
    dense = g.integers(0, 256, 16 << 20, np.uint8)   # ~len-1 runs
    rl_case("dense16m", dense)


attempt("rl", run_rl)

print(json.dumps(RESULTS), flush=True)
