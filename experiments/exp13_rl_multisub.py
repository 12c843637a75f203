"""Round-2: A/B the multi-sub-tile RL kernels + the in-jit chained FL
headline, in ONE chip session (same-session comparisons only — see
FINDINGS.md timing rules).

  1. RL encode at tile 256 (old) / 512 / 1024 rows, sub=256, parity+rate
  2. RL decode at tile 128 (old) / 256 / 512 rows, sub=128, parity+rate
  3. FL chained encode->decode via lax.fori_loop (bench.py's new
     headline methodology) — must land BELOW the 819 GB/s HBM peak

Usage: timeout 1700 python experiments/exp13_rl_multisub.py
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

from fl_rl_compression_mpi_tpu.cli import _enable_compile_cache
from fl_rl_compression_mpi_tpu.ops import fl_jax, fl_pallas, rl_numpy, \
    rl_pallas

_enable_compile_cache()

RESULTS = {}


def fence(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[-1])


def timed(fn, reps=3, inner=2):
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


N = 64 << 20


def make_runs():
    g = np.random.default_rng(1)
    nruns = N // 32
    data = np.repeat(g.integers(0, 256, nruns, np.uint8),
                     g.integers(16, 112, nruns))[:N].copy()
    return data


DATA = make_runs()
CG, VG = rl_numpy.encode(DATA)


def run_enc():
    npad = -(-N // (1 << 20)) * (1 << 20)
    buf = np.zeros(npad, np.uint8)
    buf[:N] = DATA
    dev = jax.device_put(jnp.asarray(buf.reshape(-1, 128)))
    for R in (256, 512, 1024):
        def go():
            return rl_pallas.rl_encode_pallas(dev, jnp.int32(N),
                                              tile_rows=R, sub_rows=256)
        try:
            (packed, total), t = timed(go)
        except Exception:
            print(f"rl enc R={R}: COMPILE/RUN FAILED "
                  f"{traceback.format_exc()[-300:]}", flush=True)
            continue
        r = int(jax.device_get(total))
        counts, values = rl_pallas.rl_split_packed(packed)
        ok = (r == CG.size
              and np.array_equal(np.asarray(jax.device_get(counts[:r])), CG)
              and np.array_equal(np.asarray(jax.device_get(values[:r])), VG))
        RESULTS[f"rl_enc_{R}_gbps"] = round(N / 1e9 / t, 2)
        RESULTS[f"rl_enc_{R}_ok"] = bool(ok)
        print(f"rl encode R={R}: {N/1e9/t:.2f} GB/s parity={ok}", flush=True)


attempt("rl_enc", run_enc)


def run_dec():
    rcap = -(-CG.size // (1 << 15)) * (1 << 15)
    cbuf = np.zeros(rcap, np.uint8)
    cbuf[: CG.size] = CG
    vbuf = np.zeros(rcap, np.uint8)
    vbuf[: VG.size] = VG
    cd = jax.device_put(jnp.asarray(cbuf))
    vd = jax.device_put(jnp.asarray(vbuf))
    rows = N // 128
    for R in (128, 256, 512):
        def go():
            return rl_pallas.rl_decode_pallas(cd, vd, jnp.int32(CG.size),
                                              rows, tile_rows=R,
                                              sub_rows=128)
        try:
            out, t = timed(go)
        except Exception:
            print(f"rl dec R={R}: COMPILE/RUN FAILED "
                  f"{traceback.format_exc()[-300:]}", flush=True)
            continue
        sl = np.asarray(jax.device_get(out[: (4 << 20) // 128]))
        ok = bool(np.array_equal(sl.reshape(-1), DATA[: sl.size]))
        RESULTS[f"rl_dec_{R}_gbps"] = round(N / 1e9 / t, 2)
        RESULTS[f"rl_dec_{R}_ok"] = ok
        print(f"rl decode R={R}: {N/1e9/t:.2f} GB/s ok={ok}", flush=True)


attempt("rl_dec", run_dec)


def run_fl_chain():
    n = 256 << 20
    g = np.random.default_rng(0)
    host = g.integers(0, 16, n, np.uint8)
    npad = fl_jax.pad_to_frames(n)
    buf = np.zeros(npad, np.uint8)
    buf[:n] = host
    words = jax.device_put(jnp.asarray(buf.view(np.uint32)))
    nn = jnp.int32(n)

    def roundtrip(_, w):
        b, f = fl_pallas.fl_encode_fields_pallas(
            w, nn, frame_length=128, tile_r=2048)
        return fl_pallas.fl_decode_fields_pallas(
            f, b, nn, frame_length=128, tile_r=512)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(w, k):
        return jax.lax.fori_loop(0, k, roundtrip, w)

    inner = 24
    jax.device_get(chain(words, 1).ravel()[-1])
    jax.device_get(chain(words, 1 + inner).ravel()[-1])
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.device_get(chain(words, 1).ravel()[-1])
        t1 = time.perf_counter()
        jax.device_get(chain(words, 1 + inner).ravel()[-1])
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / inner)
    t_pair = max(float(np.median(ts)), 1e-9)
    ok = bool(np.array_equal(
        np.asarray(jax.device_get(chain(words, 1))).view(np.uint8)[:n],
        host))
    RESULTS["fl_chained_fori_gbps"] = round(2 * n / 1e9 / t_pair, 1)
    RESULTS["fl_chained_ok"] = ok
    print(f"fl chained (fori_loop, 24 inner): {2*n/1e9/t_pair:.1f} GB/s "
          f"roundtrip_ok={ok}", flush=True)


attempt("fl_chain", run_fl_chain)

print(json.dumps(RESULTS), flush=True)
