"""Round-5: extend the multi-ref uniform-kernel ladder (VERDICT r4
item 3).  exp53/54 priced nref ∈ {4, 8} at R=1024 for fb ∈ {1,2,4};
unpriced combinations remain: nref=2, nref×R=2048 combos, and the
round-5 ODD-width multi-ref (flat-plane blocks, w3/w5).

Production-shaped chains (widths + flag + bits2d — the exp42/exp54
lesson), 128 MiB pairs, 3 interleaved cycles, parity + golden exact
per variant before any timing.

Usage: timeout 1680 python experiments/exp55_mr_ladder.py
       ARMS="4:1024:1,4:1024:2,..."  (fb:R:nref triples)
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
from fl_rl_compression_mpi_tpu.ops import fl_dense_pallas as dp
from fl_rl_compression_mpi_tpu.ops import fl_numpy

_enable_compile_cache()

SZ = (1 << 21) if SMOKE else (128 << 20)
CYCLES = 1 if SMOKE else 3
LAT = 0.05

DEFAULT_ARMS = ("4:1024:1,4:1024:2,4:1024:4,4:2048:4,4:2048:8,"
                "2:1024:2,2:1024:4,2:2048:4")
if SMOKE:
    DEFAULT_ARMS = "4:32:2,3:32:2,5:32:4"


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


def mk_w(b, n, npad, rng):
    lo = 1 << (b - 1) if b > 1 else 0
    data = rng.integers(lo, 1 << b, npad).astype(np.uint8)
    data[::128] = np.uint8((1 << b) - 1)
    data[n:] = 0
    return data


def main():
    arms = [tuple(int(x) for x in a.split(":"))
            for a in os.environ.get("ARMS", DEFAULT_ARMS).split(",")]
    n = SZ
    align = max(R * 512 for _, R, _ in arms)
    npad = -(-n // align) * align
    rows = npad // 512
    nfr = -(-n // 128)
    nf = jnp.int32(nfr)
    rng = np.random.default_rng(0)
    results = []

    def emit(row):
        results.append(row)
        print(json.dumps(row), flush=True)

    def chain_for(fb, R, nref):
        def rt(w):
            b2, dense, flag = dp.fl_encode_dense_uniform_pallas(
                w, nf, fb, tile_r=R, nref=nref)
            return dp.fl_decode_dense_uniform_pallas(
                dense, fb, rows, tile_r=R, nref=nref).reshape(-1)

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(w, k):
            return jax.lax.fori_loop(0, k, lambda _, v: rt(v), w)
        return chain

    good = []
    datas = {}
    for fb, R, nref in arms:
        if rows % R:
            emit({"exp": 55, "fb": fb, "R": R, "nref": nref,
                  "error": "rows%R"})
            continue
        if fb not in datas:
            data = mk_w(fb, n, npad, rng)
            datas[fb] = (data, fl_numpy.encode(data[:n]),
                         jax.device_put(jnp.asarray(data.view(np.uint32))))
        data, (bg, vg), wd = datas[fb]
        print(f"compiling fb={fb} R={R} nref={nref}", flush=True)
        ch = chain_for(fb, R, nref)
        try:
            o1 = np.asarray(jax.device_get(ch(wd, 1)))
        except Exception as e:
            emit({"exp": 55, "fb": fb, "R": R, "nref": nref,
                  "error": type(e).__name__, "msg": str(e)[:200]})
            continue
        ok = bool(np.array_equal(o1.view(np.uint8)[:n], data[:n]))
        b2, dense, flag = dp.fl_encode_dense_uniform_pallas(
            wd, nf, fb, tile_r=R, nref=nref)
        gok = bool(np.array_equal(
            np.ascontiguousarray(
                np.asarray(jax.device_get(dense))).reshape(
                    -1).view(np.uint8)[: vg.size], vg))
        bok = bool(np.array_equal(
            np.asarray(jax.device_get(b2)).reshape(-1)[: bg.size], bg))
        emit({"exp": 55, "fb": fb, "R": R, "nref": nref, "parity": ok,
              "golden": gok, "bits_ok": bok,
              "flag": int(jax.device_get(flag))})
        if ok and gok and bok and not int(jax.device_get(flag)):
            good.append((fb, R, nref, ch, wd))

    if SMOKE:
        sys.exit(0 if len(good) == len(arms) else 1)

    inner = {}
    for fb, R, nref, ch, wd in good:
        t1 = time_chain(ch, wd, inner=2, reps=1)
        inner[(fb, R, nref)] = max(6, min(96, int(0.4 / t1)))
    for cyc in range(CYCLES):
        for fb, R, nref, ch, wd in good:
            t = time_chain(ch, wd, inner[(fb, R, nref)])
            emit({"exp": 55, "cycle": cyc, "fb": fb, "R": R,
                  "nref": nref, "pair_gbps": round(2 * n / 1e9 / t, 1)})

    with open("/tmp/exp55.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
