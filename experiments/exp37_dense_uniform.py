"""Round-2: dense FL uniform-width static routing — chip A/B vs git HEAD.

Full tiles whose frames all share b ∈ {1,2,4,8} replace the dense
kernels' prefix-sum + two-array routing (encode) and marker-route +
fill + two-array expansion (decode) with trace-time-simulated static
take masks: one roll + one select per round on a single array (see
fl_dense_pallas.py).  Also re-validates the RL decode constant-tile
check after fusing it into the cursor reduction (a separate any()
cost ~6% on dense streams — exp36).

Arms (same session, interleaved):
  old_*  — git HEAD kernels (loaded via `git show`)
  new_*  — working tree
Streams (dense pair, 128 MiB): w4 (bench stream), w8 (natural-image
widths), w1 (zeros); RL pair (64 MiB): long (regression arm), zeros.

Usage: timeout 1700 python experiments/exp37_dense_uniform.py
SMOKE=1 runs interpret-mode parity on CPU.
"""

import functools
import json
import os
import re
import subprocess
import sys
import time
import traceback
import types

sys.path.insert(0, "/root/repo")

SMOKE = bool(int(os.environ.get("SMOKE", "0")))
if SMOKE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("FLRL_DENSE_TILE_R", "8")
    os.environ.setdefault("FLRL_DENSE_DEC_TILE_R", "8")

import jax
import jax.numpy as jnp
import numpy as np

from fl_rl_compression_mpi_tpu.cli import _enable_compile_cache
from fl_rl_compression_mpi_tpu.ops import (fl_dense_pallas, fl_numpy,
                                           rl_pallas)

_enable_compile_cache()
RESULTS = {}
CYCLES = 1 if SMOKE else 3
LANES = 128


def load_old(relpath, name, rev="fb2ed7d"):
    # rev fb2ed7d = last commit BEFORE any fast-path work (the uniform
    # dense routing landed in f5675bd, so HEAD is not a valid A arm)
    src = subprocess.check_output(
        ["git", "-C", "/root/repo", "show", f"{rev}:{relpath}"],
        text=True)
    src = re.sub(r"from \.(\w+) import",
                 r"from fl_rl_compression_mpi_tpu.ops.\1 import", src)
    src = re.sub(r"from \. import",
                 "from fl_rl_compression_mpi_tpu.ops import", src)
    mod = types.ModuleType(name)
    mod.__file__ = f"<git HEAD {relpath}>"
    exec(compile(src, name + ".py", "exec"), mod.__dict__)
    return mod


def gen(seed, n, kind):
    g = np.random.default_rng(seed)
    if kind == "w1":
        return np.zeros(n, np.uint8)
    if kind == "w2":
        return g.integers(0, 4, n, np.uint8)
    if kind == "w3":
        return (g.integers(0, 4, n) + 4).astype(np.uint8)
    if kind == "w4":
        return g.integers(0, 16, n, np.uint8)
    if kind == "w8":
        return g.integers(0, 256, n, np.uint8)
    if kind == "mixed":
        half = n // 2
        return np.concatenate([g.integers(0, 16, half, np.uint8),
                               g.integers(0, 256, n - half, np.uint8)])
    if kind == "rl-long":
        k = n // 32
        return np.repeat(g.integers(0, 256, k, np.uint8),
                         g.integers(16, 112, k))[:n].copy()
    raise ValueError(kind)


def dense_parity(mod, n_bytes, kind, seed=3):
    host = gen(seed, n_bytes, kind)
    R = mod.DENSE_TILE_R
    tile_b = R * LANES * 4
    npad = -(-n_bytes // tile_b) * tile_b
    buf = np.zeros(npad, np.uint8)
    buf[:n_bytes] = host
    frames = -(-n_bytes // 128)
    nf = jnp.int32(frames)
    words = jnp.asarray(buf.view(np.uint32))
    bits2d, dense, total, woffs = mod.fl_encode_dense_pallas(words, nf)
    bg, vg = fl_numpy.encode(host)
    bits = np.asarray(bits2d).reshape(-1)[:frames]
    vb = np.asarray(dense).view(np.uint8)
    ok = (np.array_equal(bits, bg)
          and np.array_equal(vb[:vg.size], vg))
    if not ok:
        print(f"dense encode parity FAIL {kind}", flush=True)
    if mod.DENSE_TILE_R == mod.DENSE_DEC_TILE_R:
        out = mod.fl_decode_dense_pallas(
            np.asarray(dense).reshape(-1, 128), bits2d, woffs, nf)
        got = np.asarray(out).reshape(-1).view(np.uint8)[:n_bytes]
        ok2 = np.array_equal(got, host)
        if not ok2:
            print(f"dense decode parity FAIL {kind}", flush=True)
        ok = ok and ok2
    return ok


def time_chain(chain, w, inner, reps=3):
    jax.device_get(chain(w, 1).ravel()[-1])
    jax.device_get(chain(w, 1 + inner).ravel()[-1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(chain(w, 1).ravel()[-1])
        t1 = time.perf_counter()
        jax.device_get(chain(w, 1 + inner).ravel()[-1])
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / inner)
    return max(float(np.median(ts)), 1e-9)


def main():
    allok = True
    for kind in ("w1", "w2", "w3", "w4", "w8", "mixed"):
        nb = ((1 << 20) if SMOKE else (4 << 20)) + 13
        allok &= dense_parity(fl_dense_pallas, nb, kind)
    RESULTS["parity_new"] = bool(allok)
    print(f"parity_new={allok}", flush=True)
    if SMOKE or not allok:
        print(json.dumps(RESULTS), flush=True)
        return

    old_dense = load_old(
        "fl_rl_compression_mpi_tpu/ops/fl_dense_pallas.py",
        "fl_dense_old")
    old_rl = load_old(
        "fl_rl_compression_mpi_tpu/ops/rl_pallas.py", "rl_old")

    chains = {}

    # dense pair chains, 128 MiB
    nd = 128 << 20
    nwd = nd // 4
    for kind in ("w4", "w8", "w1", "mixed"):
        host = gen(11, nd, kind)
        words = jax.device_put(jnp.asarray(host.view(np.uint32)))
        nf = jnp.int32(nd // 128)
        for tag, mod in (("old", old_dense), ("new", fl_dense_pallas)):
            R = mod.DENSE_TILE_R

            def dense_rt(w, mod=mod, nf=nf):
                b2, dense, _, woffs = mod.fl_encode_dense_pallas(w, nf)
                return mod.fl_decode_dense_pallas(
                    dense.reshape(-1, 128), b2, woffs,
                    nf).reshape(-1)[:nwd]

            @functools.partial(jax.jit, static_argnames=("k",))
            def chain(w, k, fn=dense_rt):
                return jax.lax.fori_loop(0, k, lambda _, v: fn(v), w)

            o1 = np.asarray(jax.device_get(chain(words, 1)))
            ok = bool(np.array_equal(o1.view(np.uint8), host))
            RESULTS[f"{tag}_dense_{kind}_ok"] = ok
            print(f"{tag}_dense_{kind} ok={ok}", flush=True)
            if ok:
                chains[f"{tag}_dense_{kind}"] = (chain, words, 2 * nd, 6)

    # RL pair chains, 64 MiB
    nr = 64 << 20
    rows = nr // 128
    nn = jnp.int32(nr)
    for kind in ("rl-long", "w1"):
        host = gen(12, nr, kind)
        x2d = jax.device_put(jnp.asarray(host.reshape(rows, LANES)))
        for tag, mod in (("old", old_rl), ("new", rl_pallas)):
            def pair(v, mod=mod):
                packed, total = mod.rl_encode_pallas(v, nn)
                return mod.rl_decode_packed_pallas(packed, total, rows)

            @functools.partial(jax.jit, static_argnames=("k",))
            def chain(v, k, pair=pair):
                return jax.lax.fori_loop(0, k, lambda _, y: pair(y), v)

            o1 = np.asarray(jax.device_get(chain(x2d, 1)))
            ok = bool(np.array_equal(o1.reshape(-1), host))
            RESULTS[f"{tag}_rl_{kind}_ok"] = ok
            print(f"{tag}_rl_{kind} ok={ok}", flush=True)
            if ok:
                chains[f"{tag}_rl_{kind}"] = (chain, x2d, 2 * nr, 8)

    for cyc in range(CYCLES):
        for name, (chain, w, byts, inner) in chains.items():
            try:
                t = time_chain(chain, w, inner=inner,
                               reps=(3 if cyc == 0 else 1))
            except Exception:
                print(f"{name}: FAILED "
                      f"{traceback.format_exc()[-300:]}", flush=True)
                continue
            r = byts / 1e9 / t
            RESULTS.setdefault(name, []).append(round(r, 2))
            print(f"cycle {cyc} {name}: {r:.2f} GB/s", flush=True)

    print(json.dumps(RESULTS), flush=True)


try:
    main()
except Exception:
    print(f"MAIN FAILED\n{traceback.format_exc()[-800:]}", flush=True)
    print(json.dumps(RESULTS), flush=True)
