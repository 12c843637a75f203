"""Round-2: RL encode constant-tile fast path — chip A/B vs git HEAD.

Real files are dominated by long constant regions (zeros, flat image
areas); a tile with NO run start has a closed-form piece stream (keeps
at gidx ≡ residue mod 255, value = carried byte, start byte =
(first − j) & 0xFF), so the encoder can branch-skip its entire
~50-dependent-round scan/route pipeline — the measured latency floor
(FINDINGS.md exp33) — for those tiles.

Arms (same session, interleaved cycles, 64 MiB pair chains):
  old_*   — rl_pallas as of git HEAD (no fast path), loaded from
            `git show`, relative imports rewritten
  new_*   — working-tree rl_pallas (fast path)
Streams: zeros (100% fast-path tiles), mixed (half constant blocks),
long (bench RL stream — regression arm: fast path never triggers, the
added any()+branch must be free).

Usage: timeout 1700 python experiments/exp36_rl_const.py
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

import jax
import jax.numpy as jnp
import numpy as np

from fl_rl_compression_mpi_tpu.cli import _enable_compile_cache
from fl_rl_compression_mpi_tpu.ops import rl_numpy, rl_pallas

_enable_compile_cache()
RESULTS = {}
CYCLES = 1 if SMOKE else 3
LANES = 128


def load_old_rl():
    src = subprocess.check_output(
        ["git", "-C", "/root/repo", "show",
         "HEAD:fl_rl_compression_mpi_tpu/ops/rl_pallas.py"], text=True)
    src = re.sub(r"from \. import", "from fl_rl_compression_mpi_tpu.ops"
                 " import", src)
    src = re.sub(r"from \.lanes import",
                 "from fl_rl_compression_mpi_tpu.ops.lanes import", src)
    mod = types.ModuleType("rl_pallas_old")
    mod.__file__ = "<git HEAD rl_pallas.py>"
    exec(compile(src, "rl_pallas_old.py", "exec"), mod.__dict__)
    return mod


def gen(seed, n, kind):
    g = np.random.default_rng(seed)
    if kind == "zeros":
        return np.zeros(n, np.uint8)
    if kind == "long":
        k = n // 32
        return np.repeat(g.integers(0, 256, k, np.uint8),
                         g.integers(16, 112, k))[:n].copy()
    if kind == "mixed":
        blocks = []
        tot = 0
        while tot < n:
            if (len(blocks) % 2) == 0:
                b = np.full(min(4 << 20, n - tot),
                            int(g.integers(0, 256)), np.uint8)
            else:
                m = min(4 << 20, n - tot)
                k = max(1, m // 32)
                b = np.repeat(g.integers(0, 256, k, np.uint8),
                              g.integers(16, 112, k))[:m].copy()
                if b.size < m:
                    b = np.concatenate([b, np.zeros(m - b.size, np.uint8)])
            blocks.append(b)
            tot += b.size
        return np.concatenate(blocks)[:n]
    raise ValueError(kind)


def parity(mod, n_bytes, kind, seed=3):
    host = gen(seed, n_bytes, kind)
    tile = mod.TILE_ROWS * LANES
    npad = -(-n_bytes // tile) * tile
    buf = np.zeros(npad, np.uint8)
    buf[:n_bytes] = host
    x2d = jnp.asarray(buf.reshape(-1, LANES))
    packed, total = mod.rl_encode_pallas(x2d, jnp.int32(n_bytes))
    counts, values = mod.rl_split_packed(packed, total, jnp.int32(n_bytes))
    t = int(total)
    cg, vg = rl_numpy.encode(host)
    ok = (np.array_equal(np.asarray(counts)[:t], cg)
          and np.array_equal(np.asarray(values)[:t], vg))
    if not ok:
        print(f"parity FAIL {kind}", flush=True)
    out = mod.rl_decode_packed_pallas(packed, total, npad // LANES)
    ok2 = np.array_equal(
        np.asarray(jax.device_get(out)).reshape(-1)[:n_bytes], host)
    if not ok2:
        print(f"roundtrip FAIL {kind}", flush=True)
    return ok and ok2


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
    for kind in ("zeros", "mixed", "long"):
        nb = ((1 << 20) if SMOKE else (4 << 20)) + 13
        allok &= parity(rl_pallas, nb, kind)
    RESULTS["parity_new"] = bool(allok)
    print(f"parity_new={allok}", flush=True)
    if SMOKE or not allok:
        print(json.dumps(RESULTS), flush=True)
        return

    old = load_old_rl()
    n = 64 << 20
    rows = n // 128
    nn = jnp.int32(n)

    chains = {}
    for kind in ("zeros", "mixed", "long"):
        host = gen(10, n, kind)
        x2d = jax.device_put(jnp.asarray(host.reshape(rows, LANES)))
        for tag, mod in (("old", old), ("new", rl_pallas)):
            def pair(v, mod=mod):
                packed, total = mod.rl_encode_pallas(v, nn)
                return mod.rl_decode_packed_pallas(packed, total, rows)

            @functools.partial(jax.jit, static_argnames=("k",))
            def chain(v, k, pair=pair):
                return jax.lax.fori_loop(0, k, lambda _, y: pair(y), v)

            o1 = np.asarray(jax.device_get(chain(x2d, 1)))
            ok = bool(np.array_equal(o1.reshape(-1), host))
            RESULTS[f"{tag}_{kind}_ok"] = ok
            print(f"{tag}_{kind} roundtrip ok={ok}", flush=True)
            if ok:
                chains[f"{tag}_{kind}"] = (chain, x2d)

    for cyc in range(CYCLES):
        for name, (chain, x2d) in chains.items():
            try:
                t = time_chain(chain, x2d, inner=8,
                               reps=(3 if cyc == 0 else 1))
            except Exception:
                print(f"{name}: FAILED "
                      f"{traceback.format_exc()[-300:]}", flush=True)
                continue
            r = 2 * n / 1e9 / t
            RESULTS.setdefault(name, []).append(round(r, 2))
            print(f"cycle {cyc} {name}: {r:.2f} GB/s pair", flush=True)

    print(json.dumps(RESULTS), flush=True)


try:
    main()
except Exception:
    print(f"MAIN FAILED\n{traceback.format_exc()[-800:]}", flush=True)
    print(json.dumps(RESULTS), flush=True)
