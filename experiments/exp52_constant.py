"""Round-4b: price the CONSTANT-stream fast path on chip — the FL dense
analog of RL's exp36 constant-tile branch, but whole-stream: when every
byte is one constant c with width fb in {1,2,4,8}, every payload word is
the same 32-bit pattern, so encode is read-verify-emit-constant and
decode is verify-broadcast (no spread/pack/placement rounds at all).

Arms: zeros (c=0, the dominant real-world class; old path = uniform-w1
stripped kernels ~74 GB/s pair) and c=9 (w4 constant; old path =
uniform-w4 ~100 GB/s).  Variants: old (uniform chain), const (the new
verify-and-broadcast chain), both at the production tile choices.
3 interleaved cycles, parity + golden per variant.

Usage: timeout 1700 python experiments/exp52_constant.py
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
from fl_rl_compression_mpi_tpu.ops import fl_dense_pallas, fl_numpy

_enable_compile_cache()

SZ = (1 << 21) if SMOKE else (128 << 20)
CYCLES = 1 if SMOKE else 3
LAT = 0.05


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
    results = []

    def emit(row):
        results.append(row)
        print(json.dumps(row), flush=True)

    rows_to = 16 if SMOKE else 2048
    align = rows_to * 512
    npad = -(-n // align) * align
    rows = npad // 512
    nfr = -(-n // 128)
    nf = jnp.int32(nfr)
    Ru = 8 if SMOKE else fl_dense_pallas.DENSE_UNIFORM_TILE_R
    Rc = 8 if SMOKE else 2048

    def uni_chain(fb, R):
        def rt(w):
            b2, dense, flag = \
                fl_dense_pallas.fl_encode_dense_uniform_pallas(
                    w, nf, fb, tile_r=R)
            return fl_dense_pallas.fl_decode_dense_uniform_pallas(
                dense, fb, rows, tile_r=R).reshape(-1)

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(w, k):
            return jax.lax.fori_loop(0, k, lambda _, v: rt(v), w)
        return chain

    def const_chain(cb, fb, vsz, R):
        def rt(w):
            b2, dense, _ = \
                fl_dense_pallas.fl_encode_dense_constant_pallas(
                    w, nf, cb, fb, tile_r=R)
            out, _ = fl_dense_pallas.fl_decode_dense_constant_pallas(
                dense, vsz, cb, fb, rows, tile_r=R)
            return out.reshape(-1)

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(w, k):
            return jax.lax.fori_loop(0, k, lambda _, v: rt(v), w)
        return chain

    arms = []
    for aname, c in (("zeros", 0), ("c9", 9)):
        fb = max(1, c.bit_length())
        data = np.full(npad, c, np.uint8)
        data[n:] = 0
        bg, vg = fl_numpy.encode(data[:n])
        uR = (8 if SMOKE
              else fl_dense_pallas.uniform_tile_r(fb, rows))
        variants = {"old": uni_chain(fb, uR),
                    "const": const_chain(c, fb, vg.size, Rc)}
        wd = jax.device_put(jnp.asarray(data.view(np.uint32)))
        # golden check on the constant encoder's bytes + flags
        b2, dense, ef = fl_dense_pallas.fl_encode_dense_constant_pallas(
            wd, nf, c, fb, tile_r=Rc)
        venc = np.ascontiguousarray(
            np.asarray(jax.device_get(dense))).reshape(-1).view(
                np.uint8)[: vg.size]
        bits = np.asarray(jax.device_get(b2)).reshape(-1)[: bg.size]
        emit({"exp": 52, "arm": aname, "check": "golden",
              "bits_ok": bool(np.array_equal(bits, bg)),
              "values_ok": bool(np.array_equal(venc, vg)),
              "enc_flag": int(jax.device_get(ef))})
        for vname, chain in variants.items():
            try:
                o1 = np.asarray(jax.device_get(chain(wd, 1)))
            except Exception as e:
                emit({"exp": 52, "arm": aname, "variant": vname,
                      "error": type(e).__name__, "msg": str(e)[:200]})
                continue
            ok = bool(np.array_equal(o1.view(np.uint8)[:n], data[:n]))
            emit({"exp": 52, "arm": aname, "variant": vname,
                  "parity": ok})
            if ok:
                arms.append((aname, vname, chain, wd))

    if SMOKE:
        return

    inner = {}
    for aname, vname, chain, wd in arms:
        t1 = time_chain(chain, wd, inner=2, reps=1)
        inner[(aname, vname)] = max(4, min(96, int(0.4 / t1)))
    for cyc in range(CYCLES):
        for aname, vname, chain, wd in arms:
            t = time_chain(chain, wd, inner[(aname, vname)])
            emit({"exp": 52, "cycle": cyc, "arm": aname,
                  "variant": vname,
                  "pair_gbps": round(2 * n / 1e9 / t, 1)})

    with open("/tmp/exp52.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
