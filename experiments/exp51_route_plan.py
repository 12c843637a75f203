"""Round-4b: price the STREAM-PLAN specializations of the general dense
kernels on chip — the two levers left unpriced after exp48 killed the
structural reformulations:

  * route_nbits — run only the LSB/MSB routing rounds the stream's true
    max distance needs (exact from the widths header on decode; encode
    verifies a speculated bound with a free scalar flag).  Host math
    says BMP needs 13 of 15 encode rounds / 13 of 15 decode rounds;
    mixed needs 14/14 — so the ceiling of this lever is ~7% (bmp).
  * wmin — skip pack/unpack select-OR variants below the stream's
    narrowest width (BMP has NO frame below width 4: variants 1-3 are
    dead weight; mixed has all widths: control arm).

Arms: bmp (reference sample tiled to 128 MiB), mixed (per-frame random
widths 1..8).  Variants per arm: prod (defaults), nb (route_nbits
exact), wm (wmin exact), both.  3 interleaved cycles, chained pairs,
parity + golden compare per variant.

Usage: timeout 1700 python experiments/exp51_route_plan.py
       SMOKE=1 ... (CPU interpret parity only, small sizes)
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
R = 8 if SMOKE else 256


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


def mk_mixed(n, npad, rng):
    data = rng.integers(0, 256, npad).astype(np.uint8)
    nfr = -(-n // 128)
    wf = rng.integers(1, 9, nfr)
    m2 = data[: nfr * 128].reshape(nfr, 128)
    m2 &= ((1 << wf) - 1).astype(np.uint8)[:, None]
    m2[:, 0] = (1 << (wf - 1)).astype(np.uint8)
    data[n:] = 0
    return data


def mk_bmp(n, npad, rng):
    bmp = np.fromfile(
        "/root/reference/example_input/sample_1280×853.bmp", np.uint8)
    data = np.resize(bmp, npad)
    data[n:] = 0
    return data


def main():
    rng = np.random.default_rng(0)
    n = SZ
    align = R * 512
    npad = -(-n // align) * align
    nfr = -(-n // 128)
    nf = jnp.int32(nfr)
    results = []

    def emit(row):
        results.append(row)
        print(json.dumps(row), flush=True)

    def pair_chain(wmin, enb, dnb):
        full = (R * 128 - 1).bit_length()
        spec_e = wmin > 1 or (enb is not None and enb < full)

        def rt(w):
            outs = fl_dense_pallas.fl_encode_dense_pallas(
                w, nf, tile_r=R, wmin=wmin, route_nbits=enb)
            b2, dense, _, woffs = outs[:4]
            return fl_dense_pallas.fl_decode_dense_pallas(
                dense.reshape(-1, 128), b2, woffs, nf, tile_r=R,
                wmin=wmin, route_nbits=dnb).reshape(-1)

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(w, k):
            return jax.lax.fori_loop(0, k, lambda _, v: rt(v), w)
        return chain, spec_e

    arms = {}
    for aname, mk in (("bmp", mk_bmp), ("mixed", mk_mixed)):
        data = mk(n, npad, rng)
        bg, vg = fl_numpy.encode(data[:n])
        wmin, enb, dnb = fl_dense_pallas.host_route_plan(
            bg, nfr, enc_r=R, dec_r=R)
        emit({"exp": 51, "arm": aname, "plan_wmin": wmin,
              "plan_enc_nbits": enb, "plan_dec_nbits": dnb})
        wd = jax.device_put(jnp.asarray(data.view(np.uint32)))
        variants = {
            "prod": pair_chain(1, None, None),
            "nb": pair_chain(1, enb, dnb),
            "wm": pair_chain(wmin, None, None),
            "both": pair_chain(wmin, enb, dnb),
        }
        # parity (one round trip) + golden (encode bytes vs fl_numpy)
        good = {}
        for vname, (chain, spec_e) in variants.items():
            try:
                o1 = np.asarray(jax.device_get(chain(wd, 1)))
            except Exception as e:
                emit({"exp": 51, "arm": aname, "variant": vname,
                      "error": type(e).__name__, "msg": str(e)[:200]})
                continue
            ok = bool(np.array_equal(o1.view(np.uint8)[:n], data[:n]))
            outs = fl_dense_pallas.fl_encode_dense_pallas(
                wd, nf, tile_r=R,
                wmin=(wmin if vname in ("wm", "both") else 1),
                route_nbits=(enb if vname in ("nb", "both") else None))
            venc = np.asarray(
                jax.device_get(outs[1])).view(np.uint8)[: vg.size]
            flag = int(jax.device_get(outs[4])) if len(outs) > 4 else 0
            gok = bool(np.array_equal(venc, vg))
            emit({"exp": 51, "arm": aname, "variant": vname,
                  "parity": ok, "golden": gok, "flag": flag})
            if ok and gok and flag == 0:
                good[vname] = chain
        arms[aname] = (wd, good)

    if SMOKE:
        return

    # adaptive inner: target >= ~0.35 s of differenced device work
    inner = {}
    for aname, (wd, good) in arms.items():
        for vname, chain in good.items():
            t1 = time_chain(chain, wd, inner=2, reps=1)
            inner[(aname, vname)] = max(4, min(48, int(0.35 / t1)))

    for cyc in range(CYCLES):
        for aname, (wd, good) in arms.items():
            for vname, chain in good.items():
                t = time_chain(chain, wd, inner[(aname, vname)])
                emit({"exp": 51, "cycle": cyc, "arm": aname,
                      "variant": vname,
                      "pair_gbps": round(2 * n / 1e9 / t, 1)})

    with open("/tmp/exp51.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
