"""Round-2: DEFINITIVE compact-widths A/B.  exp19's chain numbers were
garbage (several above the 819 GB/s HBM peak, orderings inverted vs
exp18): a 24-iteration chain differenced ~43 ms of device time against
multi-ms tunnel-RTT jitter.  This rerun fixes the methodology:

  * inner=128 chain iterations (~230 ms differenced signal, jitter < 5%)
  * interleaved A/B cycles (base, c32, copy measured round-robin x4 so
    session drift shows up as cycle spread, not variant bias)
  * single-op CHAINS: encode(encode(w)) is legal (fields are u32 words),
    decode(decode(f), bits) reuses one widths array — per-op rates with
    chain-grade serialization (credited N bytes per step).

Variants: encode widths {u8 (rows,4) production, c32 (rows/32,128) i32
compact}, decode widths {u8, c32roll}, roundtrips, copy-pair ceiling.

Usage: timeout 1700 python experiments/exp20_chain_interleaved.py
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
from exp19_compact_widths import (  # noqa: E402  (vendored variants)
    enc_variant, dec_variant, copy_call, LANES, NROWS, WORDS, HOST, N,
    SMOKE)

_enable_compile_cache()
RESULTS = {}
CYCLES = 1 if SMOKE else 4


def time_chain(chain, words, inner=128, reps=3):
    jax.device_get(chain(words, 1).ravel()[-1])
    jax.device_get(chain(words, 1 + inner).ravel()[-1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(chain(words, 1).ravel()[-1])
        t1 = time.perf_counter()
        jax.device_get(chain(words, 1 + inner).ravel()[-1])
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / inner)
    return max(float(np.median(ts)), 1e-9)


def make_rt(em, dm, et, dt):
    ego = enc_variant(em, et)
    dgo = dec_variant(dm, dt)

    def roundtrip(w):
        f, b = ego(w.reshape(NROWS, LANES))
        return dgo(f, b).reshape(-1)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(w, k):
        return jax.lax.fori_loop(0, k, lambda _, v: roundtrip(v), w)
    return chain


def make_enc_chain(em, et):
    ego = enc_variant(em, et)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(w, k):
        def body(_, v):
            f, b = ego(v.reshape(NROWS, LANES))
            return f.reshape(-1)
        return jax.lax.fori_loop(0, k, body, w)
    return chain


def make_dec_chain(dm, dt, bits):
    dgo = dec_variant(dm, dt)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(f, k):
        def body(_, v):
            return dgo(v.reshape(NROWS, LANES), bits).reshape(-1)
        return jax.lax.fori_loop(0, k, body, f)
    return chain


def make_copy_chain(tile_r):
    cp = copy_call(tile_r, NROWS)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(w, k):
        def body(_, v):
            return cp(cp(v).reshape(-1)).reshape(-1)
        return jax.lax.fori_loop(0, k, body, w)
    return chain


def main():
    wflat = WORDS.reshape(-1)
    # produce decode inputs + parity check once
    ego_u8 = enc_variant("u8", 2048)
    ego_c32 = enc_variant("c32", 2048)
    f_u8, b_u8 = ego_u8(WORDS.reshape(NROWS, LANES))
    f_c32, b_c32 = ego_c32(WORDS.reshape(NROWS, LANES))
    bu = np.asarray(jax.device_get(b_u8)).reshape(-1)
    bc = np.asarray(jax.device_get(b_c32)).reshape(-1)
    RESULTS["c32_parity"] = bool(np.array_equal(bu.astype(np.int32), bc))
    out = dec_variant("c32roll", 1024)(f_c32, b_c32)
    RESULTS["c32_roundtrip"] = bool(np.array_equal(
        np.asarray(jax.device_get(out)).reshape(-1).view(np.uint8), HOST))
    print(f"parity={RESULTS['c32_parity']} "
          f"roundtrip={RESULTS['c32_roundtrip']}", flush=True)
    ff = f_u8.reshape(-1)

    s = 32 if SMOKE else 1   # smoke: interpret mode, shrink chain length
    chains = {
        "copy_pair": (make_copy_chain(2048), wflat, 4 * N, 64 // s or 1),
        "enc_u8": (make_enc_chain("u8", 2048), wflat, N, 128 // s),
        "enc_c32": (make_enc_chain("c32", 2048), wflat, N, 128 // s),
        "dec_u8_1024": (make_dec_chain("u8", 1024, b_u8), ff, N,
                        128 // s),
        "dec_c32_1024": (make_dec_chain("c32roll", 1024, b_c32), ff, N,
                         128 // s),
        "dec_c32_512": (make_dec_chain("c32roll", 512, b_c32), ff, N,
                        128 // s),
        "rt_u8_2048_1024": (make_rt("u8", "u8", 2048, 1024), wflat,
                            2 * N, 96 // s),
        "rt_c32_2048_1024": (make_rt("c32", "c32roll", 2048, 1024),
                             wflat, 2 * N, 96 // s),
        "rt_c32_2048_512": (make_rt("c32", "c32roll", 2048, 512),
                            wflat, 2 * N, 96 // s),
    }

    for cyc in range(CYCLES):
        for name, (chain, w, nbytes, inner) in chains.items():
            try:
                t = time_chain(chain, w, inner=inner,
                               reps=(3 if cyc == 0 else 1))
            except Exception:
                print(f"{name}: FAILED "
                      f"{traceback.format_exc()[-300:]}", flush=True)
                chains[name] = (chain, w, nbytes, inner)
                continue
            r = nbytes / 1e9 / t
            cr = r * (2 * N if "rt" in name else N) / nbytes
            RESULTS.setdefault(name, []).append(round(r, 1))
            print(f"cycle {cyc} {name}: {r:.1f} GB/s (moved basis; "
                  f"credited {cr:.1f})", flush=True)

    print(json.dumps(RESULTS), flush=True)


try:
    main()
except Exception:
    print(f"MAIN FAILED\n{traceback.format_exc()[-800:]}", flush=True)
    print(json.dumps(RESULTS), flush=True)
