"""Round-2 chip session #4.

exp8 crashed the TPU worker inside rl_decode_pallas (kernel fault; the
kernel passes interpret mode).  The window DMA row offset is now clamped.
Order of operations — riskiest last so a fault doesn't cost the session's
measurements:
  1. FL encode with widths-via-DMA (variant K) tiles {1024, 2048} + parity
  2. decode re-measure tiles {512, 1024} (exp7/exp8 disagreed 490 vs 271)
  3. dense FL encode tiles {256, 512} + parity vs host fold
  4. RL encode tile_rows {64, 128, 256}
  5. RL decode SMALL (4 MiB) with parity   <- crashed last time
  6. RL decode 64 MiB long-run config

Usage: timeout 1700 python experiments/exp9_bisect_and_measure.py
"""

import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from fl_rl_compression_mpi_tpu.cli import _enable_compile_cache
from fl_rl_compression_mpi_tpu.native import get_native
from fl_rl_compression_mpi_tpu.ops import fl_dense_pallas, fl_pallas, \
    rl_jax, rl_numpy

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


def run_encK():
    global bits_d, fields_d
    for tr in (1024, 2048):
        (bits_d, fields_d), t = timed(
            lambda: fl_pallas.fl_encode_fields_pallas(
                words, nn, frame_length=128, tile_r=tr))
        RESULTS[f"encK_tile{tr}"] = round(N / 1e9 / t, 1)
        print(f"encode-K tile {tr}: {N/1e9/t:.1f} GB/s", flush=True)
    # parity of the DMA'd widths vs host
    nat = get_native()
    bits_h = np.asarray(jax.device_get(bits_d)).reshape(-1)[:frames]
    bg, _ = nat.fl_encode(host[: 1 << 20])
    ok = bool(np.array_equal(bits_h[: bg.size], bg))
    RESULTS["encK_bits_ok"] = ok
    print("encode-K widths parity (1MiB prefix):", ok, flush=True)


attempt("encK", run_encK)


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
        np.asarray(jax.device_get(out_w)).view(np.uint8)[:N], host))
    RESULTS["roundtrip_ok"] = ok
    print("fields roundtrip ok:", ok, flush=True)


attempt("dec", run_dec)


def run_dense():
    nf = jnp.int32(frames)
    for tr in (256, 512):
        (b2, dense, total, _), t = timed(
            lambda: fl_dense_pallas.fl_encode_dense_pallas(
                words, nf, tile_r=tr), reps=3, inner=4)
        RESULTS[f"dense_tile{tr}"] = round(N / 1e9 / t, 1)
        print(f"dense encode tile {tr}: {N/1e9/t:.1f} GB/s", flush=True)
    # parity: exact byte stream vs native host encode on a 4 MiB prefix
    nat = get_native()
    bits_h = np.asarray(jax.device_get(b2)).reshape(-1)[:frames]
    vsz = int((bits_h.astype(np.int64) * 128 // 8).sum())
    head = np.asarray(jax.device_get(dense[: (4 << 20) // 4])).view(np.uint8)
    bg, vg = nat.fl_encode(host)
    ok = (np.array_equal(bits_h, bg)
          and np.array_equal(head, vg[: head.size]) and vsz == vg.size)
    RESULTS["dense_ok"] = bool(ok)
    print("dense parity:", ok, flush=True)


attempt("dense", run_dense)


def run_rl_enc():
    n = N // 4
    nruns = n // 32
    g = np.random.default_rng(1)
    data = np.repeat(g.integers(0, 256, nruns, np.uint8),
                     g.integers(16, 112, nruns))[:n].copy()
    npad = -(-n // (1 << 20)) * (1 << 20)
    buf = np.zeros(npad, np.uint8)
    buf[:n] = data
    dev = jax.device_put(jnp.asarray(buf.reshape(-1, 128)))
    global rl_enc_result, rl_data, rl_n
    rl_data, rl_n = data, n
    from fl_rl_compression_mpi_tpu.ops import rl_pallas
    for R in (64, 128, 256):
        (packed, total), t = timed(
            lambda: rl_pallas.rl_encode_pallas(dev, jnp.int32(n),
                                               tile_rows=R),
            reps=3, inner=2)
        RESULTS[f"rl_enc_R{R}"] = round(n / 1e9 / t, 2)
        print(f"rl encode R={R}: {n/1e9/t:.2f} GB/s", flush=True)
    rl_enc_result = (packed, total)


attempt("rl_enc", run_rl_enc)


def rl_dec_case(tag, data, reps=3):
    from fl_rl_compression_mpi_tpu.ops import rl_pallas
    counts, values = rl_numpy.encode(data)
    n = data.size
    npad = -(-n // (1 << 20)) * (1 << 20)
    rcap = -(-counts.size // 8192) * 8192
    cbuf = np.zeros(rcap, np.uint8)
    cbuf[:counts.size] = counts
    vbuf = np.zeros(rcap, np.uint8)
    vbuf[:values.size] = values
    cd = jax.device_put(jnp.asarray(cbuf))
    vd = jax.device_put(jnp.asarray(vbuf))
    out, t = timed(lambda: rl_pallas.rl_decode_pallas(
        cd, vd, jnp.int32(counts.size), npad // 128), reps=reps, inner=2)
    RESULTS[f"rl_dec_{tag}_gbps"] = round(n / 1e9 / t, 2)
    sl = np.asarray(jax.device_get(out.reshape(-1)[: min(n, 1 << 20)]))
    ok = bool(np.array_equal(sl, data[: min(n, 1 << 20)]))
    RESULTS[f"rl_dec_{tag}_ok"] = ok
    print(f"rl decode {tag}: {n/1e9/t:.2f} GB/s ok={ok}", flush=True)


def run_rl_dec_small():
    g = np.random.default_rng(2)
    small = np.repeat(g.integers(0, 256, (4 << 20) // 32, np.uint8),
                      g.integers(16, 112, (4 << 20) // 32))[: 4 << 20].copy()
    rl_dec_case("small4m", small)


attempt("rl_dec_small", run_rl_dec_small)


def run_rl_dec_big():
    rl_dec_case("longrun64m", rl_data)


attempt("rl_dec_big", run_rl_dec_big)

print(json.dumps(RESULTS), flush=True)
