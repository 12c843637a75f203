"""Round-4: price WIDE single-sub RL tiles on chip.

exp13 refuted bigger RL tiles, but that design kept the per-sub merge
ladders (the 2^15-element one-array routing cap forced R/sub sub-tiles +
dynamic flat shifts).  The wide two-array networks remove the cap, so an
R=512/1024 tile is ONE compaction/expansion with no merges — a different
structure exp13 never priced.  exp48 then showed big tiles collapse in
the dense FL general kernel, so expectations are low; this measures the
RL case either way.

Arms (pair chains, encode→decode in one jit, 64 MiB):
  prod      — R=256/sub=256 encode + R=128/sub=128 decode (production)
  wide512   — R=512/sub=512 both
  wide1024  — R=1024/sub=1024 both
Streams: long-run (the headline config), short-run, zeros.

Usage: timeout 1700 python experiments/exp49_rl_wide.py
SMOKE=1: interpret parity on CPU (tiny).
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
LAT_GEN = 0.05


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
        tds.append((t2 - t1 - LAT_GEN) / (1 + inner))
    return max(float(np.median(ts)), float(np.median(tds)), 1e-9)


def main():
    rng = np.random.default_rng(0)
    n = SZ
    rows = n // 128
    nn = jnp.int32(n)

    variants = ([("prod", 64, 64, 32, 32)] if SMOKE else
                [("prod", 256, 256, 128, 128),
                 ("wide512", 512, 512, 512, 512),
                 ("wide1024", 1024, 1024, 1024, 1024)])

    def pair_chain(encR, encS, decR, decS):
        def rt(v):
            packed, total = rl_pallas.rl_encode_pallas(
                v, nn, tile_rows=encR, sub_rows=encS)
            return rl_pallas.rl_decode_packed_pallas(
                packed, total, rows, tile_rows=decR, sub_rows=decS)

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(v, k):
            return jax.lax.fori_loop(0, k, lambda _, y: rt(y), v)
        return chain

    k = n // 32
    streams = {
        "long-run": np.resize(np.repeat(
            rng.integers(0, 256, k, np.uint8),
            rng.integers(16, 112, k)), n),
        "short-run": np.resize(np.repeat(
            rng.integers(0, 256, n // 3 + 2, np.uint8),
            rng.integers(1, 5, n // 3 + 2)), n),
        "zeros": np.zeros(n, np.uint8),
    }
    results = []

    def emit(row):
        results.append(row)
        print(json.dumps(row), flush=True)

    chains = {}
    data_d = {}
    for sname, data in streams.items():
        data_d[sname] = (jax.device_put(
            jnp.asarray(data.reshape(rows, 128))), data)
    for vname, encR, encS, decR, decS in variants:
        ch = pair_chain(encR, encS, decR, decS)
        ok_all = True
        for sname, (xd, data) in data_d.items():
            try:
                o1 = np.asarray(jax.device_get(ch(xd, 1)))
            except Exception as e:
                emit({"exp": 49, "variant": vname, "stream": sname,
                      "error": type(e).__name__, "msg": str(e)[:200]})
                ok_all = False
                break
            ok = bool(np.array_equal(o1.reshape(-1), data))
            emit({"exp": 49, "variant": vname, "stream": sname,
                  "parity": ok})
            ok_all = ok_all and ok
        if ok_all:
            chains[vname] = ch
    if SMOKE:
        return
    for cyc in range(CYCLES):
        for vname, ch in chains.items():
            for sname, (xd, _) in data_d.items():
                t = time_chain(ch, xd, inner=6)
                emit({"exp": 49, "cycle": cyc, "variant": vname,
                      "stream": sname,
                      "pair_gbps": round(2 * n / 1e9 / t, 2)})

    with open("/tmp/exp49.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
