"""Round-5 follow-up to exp56: price the DECODE side at R=2048
(encode fixed at its adopted 2048 single-sub; exp56 left the decode
at 1024 — its window DMA grows with the tile and was unmeasured).

A/B: decode tile_rows ∈ {1024, 2048}, chained pairs, 64 MiB, 3
interleaved cycles, parity-exact per arm, zeros / long-run / half.

Usage: timeout 1680 python experiments/exp57_rl_dec2048.py
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

from fl_rl_compression_mpi_tpu.cli import _enable_compile_cache
from fl_rl_compression_mpi_tpu.ops import rl_pallas

_enable_compile_cache()

SZ = (1 << 20) if SMOKE else (64 << 20)
CYCLES = 1 if SMOKE else 3
LAT = 0.05
DEC_RS = (128, 256) if SMOKE else tuple(
    int(x) for x in os.environ.get("DEC_RS", "1024,2048").split(","))


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


def main():
    n = SZ
    rows = n // 128
    nn = jnp.int32(n)
    rng = np.random.default_rng(0)
    nruns = n // 32
    long_run = np.repeat(rng.integers(0, 256, nruns, np.uint8),
                         rng.integers(16, 112, nruns))[:n].copy()
    half = long_run.copy()
    blk = 4 << 20
    for off in range(0, n, 2 * blk):
        half[off:off + blk] = half[off]
    streams = {"zeros": np.zeros(n, np.uint8), "long": long_run,
               "half": half}
    results = []

    def emit(row):
        results.append(row)
        print(json.dumps(row), flush=True)

    enc_r = rl_pallas.encode_tile_rows(rows)

    def chain_for(dec_r):
        def rt(v):
            packed, total = rl_pallas.rl_encode_pallas(
                v, nn, tile_rows=enc_r, sub_rows=enc_r)
            return rl_pallas.rl_decode_packed_pallas(
                packed, total, rows, tile_rows=dec_r, sub_rows=dec_r)

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(v, k):
            return jax.lax.fori_loop(0, k, lambda _, y: rt(y), v)
        return chain

    good = []
    for dec_r in DEC_RS:
        if rows % dec_r:
            emit({"exp": 57, "dec_r": dec_r, "error": "rows%R"})
            continue
        print(f"compiling dec_r={dec_r}", flush=True)
        ch = chain_for(dec_r)
        ok_all = True
        for name, s in streams.items():
            x = jax.device_put(jnp.asarray(s.reshape(rows, 128)))
            try:
                o1 = np.asarray(jax.device_get(ch(x, 1)))
            except Exception as e:
                emit({"exp": 57, "dec_r": dec_r, "stream": name,
                      "error": type(e).__name__, "msg": str(e)[:200]})
                ok_all = False
                break
            ok = bool(np.array_equal(o1.reshape(-1), s))
            emit({"exp": 57, "dec_r": dec_r, "stream": name,
                  "parity": ok})
            ok_all = ok_all and ok
        if ok_all:
            good.append((dec_r, ch))

    if SMOKE:
        sys.exit(0 if len(good) == len(DEC_RS) else 1)

    xs = {name: jax.device_put(jnp.asarray(s.reshape(rows, 128)))
          for name, s in streams.items()}
    inner = {}
    for dec_r, ch in good:
        for name in streams:
            t1 = time_chain(ch, xs[name], inner=2, reps=1)
            inner[(dec_r, name)] = max(6, min(96, int(0.4 / t1)))
    for cyc in range(CYCLES):
        for dec_r, ch in good:
            for name in streams:
                t = time_chain(ch, xs[name], inner[(dec_r, name)])
                emit({"exp": 57, "cycle": cyc, "dec_r": dec_r,
                      "stream": name,
                      "pair_gbps": round(2 * n / 1e9 / t, 2)})

    with open("/tmp/exp57.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
