"""Round-4b: production-composition A/B of the MULTI-REF uniform
kernels (exp53 measured the stripped skeleton at +55% on w4; per the
exp42 lesson, the production shape — widths compute + speculation flag
+ bits2d store — must be priced before integration).

Variants: fl_encode/decode_dense_uniform_pallas chains at
nref ∈ {1, 4, 8} × fb ∈ {1, 2, 4}, R=1024, 128 MiB pairs, 3 cycles,
parity + golden per variant.

Usage: timeout 1680 python experiments/exp54_mr_production.py
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
R = 16 if SMOKE else 1024


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
    n = SZ
    align = R * 512
    npad = -(-n // align) * align
    rows = npad // 512
    nfr = -(-n // 128)
    nf = jnp.int32(nfr)
    rng = np.random.default_rng(0)
    results = []

    def emit(row):
        results.append(row)
        print(json.dumps(row), flush=True)

    def chain_for(fb, nref):
        def rt(w):
            b2, dense, flag = dp.fl_encode_dense_uniform_pallas(
                w, nf, fb, tile_r=R, nref=nref)
            return dp.fl_decode_dense_uniform_pallas(
                dense, fb, rows, tile_r=R, nref=nref).reshape(-1)

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(w, k):
            return jax.lax.fori_loop(0, k, lambda _, v: rt(v), w)
        return chain

    nrefs = ((1, 2) if SMOKE else tuple(
        int(x) for x in os.environ.get("NREFS", "1,4,8").split(",")))
    fbs = tuple(int(x) for x in os.environ.get("FBS", "1,2,4").split(","))
    good = []
    for fb in fbs:
        data = mk_w(fb, n, npad, rng)
        bg, vg = fl_numpy.encode(data[:n])
        wd = jax.device_put(jnp.asarray(data.view(np.uint32)))
        for nref in nrefs:
            print(f"compiling fb={fb} nref={nref}", flush=True)
            ch = chain_for(fb, nref)
            try:
                o1 = np.asarray(jax.device_get(ch(wd, 1)))
            except Exception as e:
                emit({"exp": 54, "fb": fb, "nref": nref,
                      "error": type(e).__name__, "msg": str(e)[:200]})
                continue
            ok = bool(np.array_equal(o1.view(np.uint8)[:n], data[:n]))
            # golden + widths + flag through the production wrapper
            b2, dense, flag = dp.fl_encode_dense_uniform_pallas(
                wd, nf, fb, tile_r=R, nref=nref)
            gok = bool(np.array_equal(
                np.ascontiguousarray(
                    np.asarray(jax.device_get(dense))).reshape(
                        -1).view(np.uint8)[: vg.size], vg))
            bok = bool(np.array_equal(
                np.asarray(jax.device_get(b2)).reshape(-1)[: bg.size],
                bg))
            emit({"exp": 54, "fb": fb, "nref": nref, "parity": ok,
                  "golden": gok, "bits_ok": bok,
                  "flag": int(jax.device_get(flag))})
            if ok and gok and bok:
                good.append((fb, nref, ch, wd))
        # flag check: a mixed tail must trip the speculation
        if not SMOKE:
            bad = data.copy()
            bad[-129:] = 255
            for nref in nrefs[1:]:
                if fb == 4:
                    *_, fl2 = dp.fl_encode_dense_uniform_pallas(
                        jax.device_put(jnp.asarray(bad.view(np.uint32))),
                        nf, fb, tile_r=R, nref=nref)
                    emit({"exp": 54, "fb": fb, "nref": nref,
                          "flag_on_mixed_tail": int(jax.device_get(fl2))})

    if SMOKE:
        return

    inner = {}
    for fb, nref, ch, wd in good:
        t1 = time_chain(ch, wd, inner=2, reps=1)
        inner[(fb, nref)] = max(6, min(96, int(0.4 / t1)))
    for cyc in range(CYCLES):
        for fb, nref, ch, wd in good:
            t = time_chain(ch, wd, inner[(fb, nref)])
            emit({"exp": 54, "cycle": cyc, "fb": fb, "nref": nref,
                  "pair_gbps": round(2 * n / 1e9 / t, 1)})

    with open("/tmp/exp54.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
