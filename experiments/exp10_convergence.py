"""Round-2 chip session #5: same-session comparisons + RL decode retry.

Variance between sessions (decode 490 vs 271 GB/s for the same kernel in
exp7/exp8) makes cross-session deltas unreliable; this session measures
competing variants back-to-back:
  1. fields encode (with widths) vs encD (no widths), tiles 1024/2048
  2. fields decode tiles 512/1024
  3. dense encode tile 256 + on-chip parity (values vs native host)
  4. RL encode R=256 (new default) + parity
  5. RL decode with ALIGNED window DMA — small first, then 64 MiB
     (faulted the chip in exp8/exp9; riskiest last)

Usage: timeout 1700 python experiments/exp10_convergence.py
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
from fl_rl_compression_mpi_tpu.native import get_native
from fl_rl_compression_mpi_tpu.ops import fl_dense_pallas, fl_pallas, \
    rl_jax, rl_numpy, rl_pallas
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


def attempt(name, fn):
    try:
        fn()
    except Exception:
        print(f"{name}: FAILED\n{traceback.format_exc()[-500:]}",
              flush=True)


rng = np.random.default_rng(0)
host = rng.integers(0, 16, N, np.uint8)
words = jax.device_put(jnp.asarray(host.view(np.uint32)))
nn = jnp.int32(N)
frames = N // 128
print("data staged", flush=True)


def _enc_noout_kernel(w_ref, fields_ref):
    w = w_ref[...].astype(jnp.uint32)
    o = w | (w >> 8)
    o = (o | (o >> 16)) & jnp.uint32(0xFF)
    wq = _word_widths_f32exp(o)
    b_fpr, b_lane = _frame_widths_mxu(wq, 32)
    m = jnp.uint32(1) << b_lane.astype(jnp.uint32)
    r = w >> 24
    r = r * m + ((w >> 16) & jnp.uint32(0xFF))
    r = r * m + ((w >> 8) & jnp.uint32(0xFF))
    fields_ref[...] = r * m + (w & jnp.uint32(0xFF))


@functools.partial(jax.jit, static_argnames=("tile_r",))
def enc_d(x, tile_r=2048):
    nw = x.shape[0]
    return pl.pallas_call(
        _enc_noout_kernel,
        grid=(nw // (tile_r * LANES),),
        in_specs=[pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nw // LANES, LANES), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(x.reshape(nw // LANES, LANES))


def run_enc_compare():
    global bits_d, fields_d
    for tag, fn in (
        ("orig1024", lambda: fl_pallas.fl_encode_fields_pallas(
            words, nn, frame_length=128, tile_r=1024)),
        ("orig2048", lambda: fl_pallas.fl_encode_fields_pallas(
            words, nn, frame_length=128, tile_r=2048)),
        ("noout2048", lambda: enc_d(words, tile_r=2048)),
        ("noout1024", lambda: enc_d(words, tile_r=1024)),
    ):
        out, t = timed(fn)
        RESULTS[f"enc_{tag}"] = round(N / 1e9 / t, 1)
        print(f"enc {tag}: {N/1e9/t:.1f} GB/s", flush=True)
        if tag == "orig2048":
            bits_d, fields_d = out


attempt("enc", run_enc_compare)


def run_dec():
    bits_h = np.asarray(jax.device_get(bits_d)).reshape(-1)[:frames]
    bits2d = jax.device_put(jnp.asarray(
        np.ascontiguousarray(bits_h).reshape(N // 4 // 128, 4)))
    for tr in (512, 1024):
        out_w, t = timed(lambda: fl_pallas.fl_decode_fields_pallas(
            fields_d, bits2d, nn, frame_length=128, tile_r=tr))
        RESULTS[f"dec_tile{tr}"] = round(N / 1e9 / t, 1)
        print(f"decode tile {tr}: {N/1e9/t:.1f} GB/s", flush=True)
    ok = bool(np.array_equal(
        np.asarray(jax.device_get(
            out_w[: (1 << 20)])).view(np.uint8), host[: 4 << 20]))
    RESULTS["dec_spot_ok"] = ok
    print("decode spot parity:", ok, flush=True)


attempt("dec", run_dec)


def run_dense():
    nf = jnp.int32(frames)
    (b2, dense, total), t = timed(
        lambda: fl_dense_pallas.fl_encode_dense_pallas(words, nf,
                                                       tile_r=256),
        reps=3, inner=4)
    RESULTS["dense_tile256"] = round(N / 1e9 / t, 1)
    print(f"dense encode tile 256: {N/1e9/t:.1f} GB/s", flush=True)
    nat = get_native()
    bits_h = np.asarray(jax.device_get(b2)).reshape(-1)[:frames]
    bg, vg = nat.fl_encode(host)
    okb = bool(np.array_equal(bits_h, bg))
    head = np.asarray(jax.device_get(
        dense[: (4 << 20) // 4])).view(np.uint8)
    okv = bool(np.array_equal(head, vg[: head.size]))
    RESULTS["dense_ok"] = okb and okv
    print(f"dense parity bits={okb} values(4MiB)={okv} "
          f"total={int(total)} expect_words={-(-vg.size // 4)}", flush=True)


attempt("dense", run_dense)

rl_data = None


def run_rl_enc():
    global rl_data, rl_enc_counts, rl_enc_values, rl_enc_total, rl_npad
    n = N // 4
    nruns = n // 32
    g = np.random.default_rng(1)
    rl_data = np.repeat(g.integers(0, 256, nruns, np.uint8),
                        g.integers(16, 112, nruns))[:n].copy()
    rl_npad = -(-n // (1 << 20)) * (1 << 20)
    buf = np.zeros(rl_npad, np.uint8)
    buf[:n] = rl_data
    dev = jax.device_put(jnp.asarray(buf.reshape(-1, 128)))
    (packed, total), t = timed(
        lambda: rl_pallas.rl_encode_pallas(dev, jnp.int32(n),
                                           tile_rows=256),
        reps=3, inner=2)
    RESULTS["rl_enc_R256"] = round(n / 1e9 / t, 2)
    r = int(jax.device_get(total))
    cg, vg = rl_numpy.encode(rl_data)
    counts, values = rl_pallas.rl_split_packed(packed)
    c_dev = np.asarray(jax.device_get(counts[:r]))
    v_dev = np.asarray(jax.device_get(values[:r]))
    ok = (r == cg.size and np.array_equal(c_dev, cg)
          and np.array_equal(v_dev, vg))
    RESULTS["rl_enc_ok"] = bool(ok)
    rl_enc_counts, rl_enc_values, rl_enc_total = counts, values, total
    print(f"rl encode R=256: {n/1e9/t:.2f} GB/s parity={ok}", flush=True)


attempt("rl_enc", run_rl_enc)


def rl_dec_case(tag, data, reps=3):
    counts, values = rl_numpy.encode(data)
    n = data.size
    npad = -(-n // (1 << 20)) * (1 << 20)
    rcap = -(-counts.size // (1 << 15)) * (1 << 15)
    cbuf = np.zeros(rcap, np.uint8)
    cbuf[:counts.size] = counts
    vbuf = np.zeros(rcap, np.uint8)
    vbuf[:values.size] = values
    cd = jax.device_put(jnp.asarray(cbuf))
    vd = jax.device_put(jnp.asarray(vbuf))
    out, t = timed(lambda: rl_pallas.rl_decode_pallas(
        cd, vd, jnp.int32(counts.size), npad // 128), reps=reps, inner=2)
    RESULTS[f"rl_dec_{tag}_gbps"] = round(n / 1e9 / t, 2)
    sl = np.asarray(jax.device_get(out.reshape(-1)[: min(n, 4 << 20)]))
    ok = bool(np.array_equal(sl, data[: min(n, 4 << 20)]))
    RESULTS[f"rl_dec_{tag}_ok"] = ok
    print(f"rl decode {tag}: {n/1e9/t:.2f} GB/s ok={ok}", flush=True)
    print(json.dumps(RESULTS), flush=True)   # checkpoint before next risk


def run_rl_dec_small():
    g = np.random.default_rng(2)
    small = np.repeat(g.integers(0, 256, (4 << 20) // 32, np.uint8),
                      g.integers(16, 112, (4 << 20) // 32))[: 4 << 20].copy()
    rl_dec_case("small4m", small)


attempt("rl_dec_small", run_rl_dec_small)


def run_rl_dec_big():
    rl_dec_case("longrun64m", rl_data)
    # dense-run worst case (length-1 runs)
    g = np.random.default_rng(3)
    rl_dec_case("dense8m", g.integers(0, 256, 8 << 20, np.uint8))


attempt("rl_dec_big", run_rl_dec_big)

print(json.dumps(RESULTS), flush=True)
