"""Round-4: A/B the WIDE general dense tiles (R=256/512/1024) vs the
round-3 production kernel, same session, and price the stripped
single-width kernels at Ru in {1024, 2048} (two-word row masks) plus the
new odd-width stripped kernels.

New machinery under test (fl_dense_pallas round-4 changes):
  * two-array WIDE routing (dist at ctrl bits 0..30) — lifts the
    2^15-element tile cap, so the general network can run R=1024 tiles
    where the ~60 dependent vector rounds amortize over 4x the data;
  * two-array wide markers + two-plane bounded fill on the decode side;
  * presence-gated pack/unpack (only widths IN the tile run their
    select-OR variant);
  * grouped round-skip (dist bits >= 12 under one pl.when on the tile's
    true max distance).

Arms (STAGE=gen, default):
  old256        — git ecbe82e production pair (tile 256)
  new256/512/1024 — working-tree pair at each tile size
  data: mixed (per-frame random widths — adversarial), bmp (reference
  sample tiled — the real-imagery target), w4u/w8u (per-tile-uniform
  streams through the general kernel's fast arms).
One compiled chain per (module, R) serves every data arm (same shapes).

STAGE=uni: stripped single-width chains (fb, Ru) for fb in {1,4,8} x
Ru in {1024, 2048} (R=2048 needs the two-word row masks) and odd fb in
{3,5} at Ru=1024.

Usage: timeout 1700 python experiments/exp48_wide_general.py
       STAGE=uni timeout 1700 python experiments/exp48_wide_general.py
       SMOKE=1 ... (CPU interpret parity only, small sizes)
"""

import functools
import json
import os
import re
import subprocess
import sys
import time
import types

sys.path.insert(0, "/root/repo")

SMOKE = bool(int(os.environ.get("SMOKE", "0")))
STAGE = os.environ.get("STAGE", "gen")
if SMOKE:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

from fl_rl_compression_mpi_tpu.cli import _enable_compile_cache
from fl_rl_compression_mpi_tpu.ops import fl_dense_pallas, fl_numpy

_enable_compile_cache()

SZ = (1 << 21) if SMOKE else (128 << 20)      # bytes per arm
CYCLES = 1 if SMOKE else 3
LAT_GEN = 0.05


def load_old(relpath, name, rev="ecbe82e"):
    src = subprocess.check_output(
        ["git", "-C", "/root/repo", "show", f"{rev}:{relpath}"],
        text=True)
    src = re.sub(r"from \.(\w+) import",
                 r"from fl_rl_compression_mpi_tpu.ops.\1 import", src)
    src = re.sub(r"from \. import",
                 "from fl_rl_compression_mpi_tpu.ops import", src)
    mod = types.ModuleType(name)
    mod.__file__ = f"<git {rev} {relpath}>"
    exec(compile(src, name + ".py", "exec"), mod.__dict__)
    return mod


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
    # degenerate-session guard: floor the differenced time with the
    # long batch's raw wall (bench.py methodology)
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


def mk_w(b):
    def f(n, npad, rng):
        lo = 1 << (b - 1) if b > 1 else 0
        data = rng.integers(lo, 1 << b, npad).astype(np.uint8)
        data[::128] = np.uint8((1 << b) - 1)
        data[n:] = 0
        return data
    return f


def main():
    rng = np.random.default_rng(0)
    n = SZ
    align = 2048 * 512
    npad = -(-n // align) * align
    results = []

    def emit(row):
        results.append(row)
        print(json.dumps(row), flush=True)

    if STAGE == "gen":
        old = load_old("fl_rl_compression_mpi_tpu/ops/fl_dense_pallas.py",
                       "old_dense")
        nf = jnp.int32(-(-n // 128))

        def pair_chain(mod, R):
            def rt(w):
                b2, dense, _, woffs = mod.fl_encode_dense_pallas(
                    w, nf, tile_r=R)
                return mod.fl_decode_dense_pallas(
                    dense.reshape(-1, 128), b2, woffs, nf,
                    tile_r=R).reshape(-1)

            @functools.partial(jax.jit, static_argnames=("k",))
            def chain(w, k):
                return jax.lax.fori_loop(0, k, lambda _, v: rt(v), w)
            return chain

        Rs_new = (256, 1024) if SMOKE else (256, 512, 1024)
        variants = [("old256", pair_chain(old, 8 if SMOKE else 256))]
        for R in Rs_new:
            variants.append((f"new{R}", pair_chain(
                fl_dense_pallas, 8 if SMOKE else R)))
        arms = [("mixed", mk_mixed), ("bmp", mk_bmp),
                ("w4u", mk_w(4)), ("w8u", mk_w(8))]
        data_arm = {}
        for aname, mk in arms:
            data = mk(n, npad, rng)
            data_arm[aname] = (jax.device_put(
                jnp.asarray(data.view(np.uint32))), data)
        # parity: every variant, every arm, one round trip; golden
        # compare for mixed on the new1024 variant
        for vname, chain in variants:
            for aname, (wd, data) in data_arm.items():
                try:
                    o1 = np.asarray(jax.device_get(chain(wd, 1)))
                except Exception as e:
                    emit({"exp": 48, "variant": vname, "arm": aname,
                          "error": type(e).__name__, "msg": str(e)[:200]})
                    data_arm[aname] = (wd, data)
                    continue
                ok = bool(np.array_equal(o1.view(np.uint8)[:n], data[:n]))
                emit({"exp": 48, "variant": vname, "arm": aname,
                      "parity": ok})
        bg, vg = fl_numpy.encode(data_arm["mixed"][1][:n])
        b2, dense, _, _ = fl_dense_pallas.fl_encode_dense_pallas(
            data_arm["mixed"][0], nf, tile_r=8 if SMOKE else 1024)
        bits = np.asarray(jax.device_get(b2)).reshape(-1)[: bg.size]
        venc = np.asarray(jax.device_get(dense)).view(np.uint8)[: vg.size]
        emit({"exp": 48, "check": "golden-mixed-new1024",
              "bits_ok": bool(np.array_equal(bits, bg)),
              "values_ok": bool(np.array_equal(venc, vg))})
        if SMOKE:
            return
        for cyc in range(CYCLES):
            for vname, chain in variants:
                for aname, (wd, data) in data_arm.items():
                    t = time_chain(chain, wd, inner=4)
                    emit({"exp": 48, "cycle": cyc, "variant": vname,
                          "arm": aname,
                          "pair_gbps": round(2 * n / 1e9 / t, 1)})
    else:
        # STAGE=uni: stripped single-width kernels
        cfgs = [(1, 1024), (1, 2048), (4, 1024), (4, 2048), (8, 1024),
                (8, 2048), (3, 1024), (5, 1024)]
        if SMOKE:
            cfgs = [(4, 16), (3, 16)]
        nf = jnp.int32(-(-n // 128))
        rows = npad // 512

        def uni_chain(fb, Ru):
            def rt(w):
                b2, dense, flag = \
                    fl_dense_pallas.fl_encode_dense_uniform_pallas(
                        w, nf, fb, tile_r=Ru)
                return fl_dense_pallas.fl_decode_dense_uniform_pallas(
                    dense, fb, rows, tile_r=Ru).reshape(-1)

            @functools.partial(jax.jit, static_argnames=("k",))
            def chain(w, k):
                return jax.lax.fori_loop(0, k, lambda _, v: rt(v), w)
            return chain

        chains = {}
        for fb, Ru in cfgs:
            if not fl_dense_pallas.uniform_kernel_available(fb, Ru):
                emit({"exp": 48, "fb": fb, "Ru": Ru,
                      "error": "masks-unavailable"})
                continue
            data = mk_w(fb)(n, npad, rng)
            wd = jax.device_put(jnp.asarray(data.view(np.uint32)))
            ch = uni_chain(fb, Ru)
            try:
                o1 = np.asarray(jax.device_get(ch(wd, 1)))
            except Exception as e:
                emit({"exp": 48, "fb": fb, "Ru": Ru,
                      "error": type(e).__name__, "msg": str(e)[:200]})
                continue
            ok = bool(np.array_equal(o1.view(np.uint8)[:n], data[:n]))
            emit({"exp": 48, "fb": fb, "Ru": Ru, "parity": ok})
            if ok:
                chains[(fb, Ru)] = (ch, wd)
        if SMOKE:
            return
        for cyc in range(CYCLES):
            for (fb, Ru), (ch, wd) in chains.items():
                t = time_chain(ch, wd, inner=6)
                emit({"exp": 48, "cycle": cyc, "fb": fb, "Ru": Ru,
                      "pair_gbps": round(2 * n / 1e9 / t, 1)})

    with open(f"/tmp/exp48_{STAGE}.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
