"""Round-2: A/B the bucketed RL DMAs on chip, one session.

Encode: emit DMA now copies the smallest covering bucket instead of the
full (R+8)-row merged buffer.  Decode: window DMA sized by the host hint
(decode_window_rows) instead of the R+8-row worst case.  With the
worst-case-traffic term gone, larger tiles may win again — re-A/B.

Usage: timeout 1700 python experiments/exp14_bucketed_dma.py
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
from fl_rl_compression_mpi_tpu.ops import rl_numpy, rl_pallas

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
g = np.random.default_rng(1)
nruns = N // 32
DATA = np.repeat(g.integers(0, 256, nruns, np.uint8),
                 g.integers(16, 112, nruns))[:N].copy()
CG, VG = rl_numpy.encode(DATA)
DENSE = g.integers(0, 256, N, np.uint8)          # ~every byte a run
DCG, DVG = rl_numpy.encode(DENSE)


def dev_bytes(x):
    npad = -(-x.size // (1 << 20)) * (1 << 20)
    buf = np.zeros(npad, np.uint8)
    buf[: x.size] = x
    return jax.device_put(jnp.asarray(buf.reshape(-1, 128))), npad


def run_enc():
    dev, _ = dev_bytes(DATA)
    for R, SUB in ((256, 256), (512, 256), (1024, 256)):
        def go():
            return rl_pallas.rl_encode_pallas(dev, jnp.int32(N),
                                              tile_rows=R, sub_rows=SUB)
        try:
            (packed, total), t = timed(go)
        except Exception:
            print(f"enc R={R}: FAILED {traceback.format_exc()[-300:]}",
                  flush=True)
            continue
        r = int(jax.device_get(total))
        c, v = rl_pallas.rl_split_packed(packed)
        ok = (r == CG.size
              and np.array_equal(np.asarray(jax.device_get(c[:r])), CG)
              and np.array_equal(np.asarray(jax.device_get(v[:r])), VG))
        RESULTS[f"enc_{R}_gbps"] = round(N / 1e9 / t, 2)
        RESULTS[f"enc_{R}_ok"] = bool(ok)
        print(f"encode R={R} (bucketed emit): {N/1e9/t:.2f} GB/s "
              f"parity={ok}", flush=True)

    # dense worst case at the default tile: full-bucket emits every tile
    devd, _ = dev_bytes(DENSE)
    (packed, total), t = timed(lambda: rl_pallas.rl_encode_pallas(
        devd, jnp.int32(N), tile_rows=256, sub_rows=256))
    r = int(jax.device_get(total))
    c, v = rl_pallas.rl_split_packed(packed)
    ok = (r == DCG.size
          and np.array_equal(np.asarray(jax.device_get(c[:r])), DCG))
    RESULTS["enc_dense_gbps"] = round(N / 1e9 / t, 2)
    RESULTS["enc_dense_ok"] = bool(ok)
    print(f"encode dense R=256: {N/1e9/t:.2f} GB/s parity={ok}", flush=True)


attempt("enc", run_enc)


def dec_input():
    rcap = -(-CG.size // (1 << 15)) * (1 << 15)
    cbuf = np.zeros(rcap, np.uint8)
    cbuf[: CG.size] = CG
    vbuf = np.zeros(rcap, np.uint8)
    vbuf[: VG.size] = VG
    return (jax.device_put(jnp.asarray(cbuf)),
            jax.device_put(jnp.asarray(vbuf)))


def run_dec():
    cd, vd = dec_input()
    rows = N // 128
    for R, SUB, hint in ((128, 128, False), (128, 128, True),
                         (256, 128, True), (512, 128, True)):
        win = (rl_pallas.decode_window_rows(CG, rows, R) if hint else None)
        def go():
            return rl_pallas.rl_decode_pallas(cd, vd, jnp.int32(CG.size),
                                              rows, tile_rows=R,
                                              sub_rows=SUB, win_rows=win)
        try:
            out, t = timed(go)
        except Exception:
            print(f"dec R={R} win={win}: FAILED "
                  f"{traceback.format_exc()[-300:]}", flush=True)
            continue
        sl = np.asarray(jax.device_get(out[: (4 << 20) // 128]))
        ok = bool(np.array_equal(sl.reshape(-1), DATA[: sl.size]))
        tag = f"dec_{R}_w{win or 'max'}"
        RESULTS[f"{tag}_gbps"] = round(N / 1e9 / t, 2)
        RESULTS[f"{tag}_ok"] = ok
        print(f"decode R={R} win={win or 'worst'}: {N/1e9/t:.2f} GB/s "
              f"ok={ok}", flush=True)


attempt("dec", run_dec)

print(json.dumps(RESULTS), flush=True)
