"""Round-5: the one unpriced RL lever (VERDICT r4 item 4) — the
encoder's wide single-sub config at R=2048 (the round-4 two-array wide
masks lift the 2^15 routing cap, so a 2048-row single sub-tile is
structurally admissible; exp49 priced only R ∈ {512, 1024}).

A/B: encode tile_rows ∈ {1024, 2048} (sub_rows == tile_rows), decode
fixed at its adaptive default, chained pairs, 64 MiB, 3 interleaved
cycles, parity-exact per arm, on zeros / long-run / half-constant.

Usage: timeout 1680 python experiments/exp56_rl_wide2048.py
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
ENC_RS = (256, 512) if SMOKE else tuple(
    int(x) for x in os.environ.get("ENC_RS", "1024,2048").split(","))


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

    dec_r = rl_pallas.decode_tile_rows(rows)

    def chain_for(enc_r):
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
    for enc_r in ENC_RS:
        if rows % enc_r:
            emit({"exp": 56, "enc_r": enc_r, "error": "rows%R"})
            continue
        print(f"compiling enc_r={enc_r}", flush=True)
        ch = chain_for(enc_r)
        ok_all = True
        for name, s in streams.items():
            x = jax.device_put(jnp.asarray(s.reshape(rows, 128)))
            try:
                o1 = np.asarray(jax.device_get(ch(x, 1)))
            except Exception as e:
                emit({"exp": 56, "enc_r": enc_r, "stream": name,
                      "error": type(e).__name__, "msg": str(e)[:200]})
                ok_all = False
                break
            ok = bool(np.array_equal(o1.reshape(-1), s))
            emit({"exp": 56, "enc_r": enc_r, "stream": name,
                  "parity": ok})
            ok_all = ok_all and ok
        if ok_all:
            good.append((enc_r, ch))

    if SMOKE:
        sys.exit(0 if len(good) == len(ENC_RS) else 1)

    xs = {name: jax.device_put(jnp.asarray(s.reshape(rows, 128)))
          for name, s in streams.items()}
    inner = {}
    for enc_r, ch in good:
        for name in streams:
            t1 = time_chain(ch, xs[name], inner=2, reps=1)
            inner[(enc_r, name)] = max(6, min(96, int(0.4 / t1)))
    for cyc in range(CYCLES):
        for enc_r, ch in good:
            for name in streams:
                t = time_chain(ch, xs[name], inner[(enc_r, name)])
                emit({"exp": 56, "cycle": cyc, "enc_r": enc_r,
                      "stream": name,
                      "pair_gbps": round(2 * n / 1e9 / t, 2)})

    with open("/tmp/exp56.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
