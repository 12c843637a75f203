"""Round-2: dense FL decode A/B — prefetch + bounded fill + 256-row tiles.

The dense decoder (chip-measured 13.7 GB/s vs dense encode's 30-38) had
three removable costs:
  1. its window DMA was start+wait serialized although the per-tile
     offsets are precomputed on host — the new kernel double-buffers and
     prefetches tile i+1's window during tile i's compute;
  2. the marker hole-fill used a GLOBAL prefix-max although a group's
     payload spans <= 8 window slots — an 8-span bounded scan (3 rounds)
     suffices;
  3. the routing nbits used the workspace-size bound; the true max
     distance is 7*(G-1)+1024, which lets decode tiles reach 256 rows
     (2x fewer fixed costs per byte).

This A/Bs the OLD kernel (from git, pre-change) against the NEW one at
128 and 256 rows, same session, interleaved cycles; plus the chained
dense encode->decode pair (encoder-emitted woffs) as the device
end-to-end rate.

Usage: timeout 1700 python experiments/exp26_dense_dec.py
"""

import functools
import json
import os
import subprocess
import sys
import time
import traceback
import types

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from fl_rl_compression_mpi_tpu.cli import _enable_compile_cache
from fl_rl_compression_mpi_tpu.ops import fl_dense_pallas, fl_numpy

_enable_compile_cache()
RESULTS = {}
SMOKE = bool(int(os.environ.get("FLRL_EXP26_SMOKE", "0")))
N = (1 << 22) if SMOKE else (256 << 20)
CYCLES = 1 if SMOKE else 3
OLD_REV = "9dba343"


def _old_module():
    src = subprocess.check_output(
        ["git", "-C", "/root/repo", "show",
         f"{OLD_REV}:fl_rl_compression_mpi_tpu/ops/fl_dense_pallas.py"]
    ).decode()
    src = src.replace("from . import lanes",
                      "from fl_rl_compression_mpi_tpu.ops import lanes")
    src = src.replace(
        "from .fl_pallas import",
        "from fl_rl_compression_mpi_tpu.ops.fl_pallas import")
    src = src.replace(
        "from .lanes import",
        "from fl_rl_compression_mpi_tpu.ops.lanes import")
    mod = types.ModuleType("fl_dense_old")
    exec(compile(src, "fl_dense_old.py", "exec"), mod.__dict__)
    return mod


def timed(fn, reps=3, inner=4):
    out = fn()
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[-1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        o = fn()
        jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[-1])
        t1 = time.perf_counter()
        for _ in range(inner):
            o = fn()
        jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[-1])
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / inner)
    return out, max(float(np.median(ts)), 1e-9)


def main():
    old = _old_module()
    rng = np.random.default_rng(0)
    datasets = {"w4": rng.integers(0, 16, N, np.uint8),
                "w8": rng.integers(0, 256, N, np.uint8)}
    mix = rng.integers(0, 16, N, np.uint8)
    mix[N - N // 3:] = rng.integers(0, 256, N // 3, np.uint8)
    datasets["mix"] = mix

    frames = N // 128
    rows = N // 512
    nf = jnp.int32(frames)

    # encode once per dataset (new encoder; stream bytes identical),
    # prepare decode inputs exactly as fl_jax.decode does
    prepped = {}
    for name, host in datasets.items():
        words = jax.device_put(jnp.asarray(host.view(np.uint32)))
        bits2d, dense, total, woffs256 = \
            fl_dense_pallas.fl_encode_dense_pallas(words, nf, tile_r=256)
        bits = np.asarray(jax.device_get(bits2d)).reshape(-1)[:frames]
        dense2d = dense.reshape(-1, 128)
        # host offsets for arbitrary decode tiles
        def woffs_host(R):
            wper = bits.astype(np.int64).reshape(rows * 128 // (R * 128),
                                                 -1).sum(axis=1) * 4
            return jnp.asarray(np.concatenate(
                [[0], np.cumsum(wper)[:-1]]).astype(np.int32))
        prepped[name] = dict(
            host=host, words=words, bits2d=bits2d, dense2d=dense2d,
            woffs={R: woffs_host(R) for R in (128, 256)},
            woffs_enc=woffs256)
        RESULTS[f"ratio_{name}"] = round(
            float(4 * jax.device_get(total)) / N, 3)

    variants = {}

    def dec_old(p, R):
        return old.fl_decode_dense_pallas(
            p["dense2d"], p["bits2d"], p["woffs"][R], nf, tile_r=R)

    def dec_new(p, R):
        return fl_dense_pallas.fl_decode_dense_pallas(
            p["dense2d"], p["bits2d"], p["woffs"][R], nf, tile_r=R)

    variants["dec_old_128"] = functools.partial(dec_old, R=128)
    variants["dec_new_128"] = functools.partial(dec_new, R=128)
    variants["dec_new_256"] = functools.partial(dec_new, R=256)

    # parity once per variant/dataset
    for vname, fn in variants.items():
        for dn, p in datasets.items():
            try:
                out = fn(prepped[dn])
                got = np.ascontiguousarray(np.asarray(
                    jax.device_get(out)).reshape(-1)).view(np.uint8)[:N]
                ok = bool(np.array_equal(got, prepped[dn]["host"]))
            except Exception:
                print(f"{vname}/{dn}: FAILED "
                      f"{traceback.format_exc()[-400:]}", flush=True)
                ok = False
            RESULTS[f"parity_{vname}_{dn}"] = ok
            print(f"parity {vname}/{dn}: {ok}", flush=True)

    # chained encode->decode pair in one jit (encoder woffs, R=256)
    def rt(w):
        b2, dense, _, woffs = fl_dense_pallas.fl_encode_dense_pallas(
            w, nf, tile_r=256)
        return fl_dense_pallas.fl_decode_dense_pallas(
            dense.reshape(-1, 128), b2, woffs, nf,
            tile_r=256).reshape(-1)

    @functools.partial(jax.jit, static_argnames=("k",))
    def rt_chain(w, k):
        return jax.lax.fori_loop(0, k, lambda _, v: rt(v), w)

    for dn, p in prepped.items():
        o1 = np.ascontiguousarray(np.asarray(jax.device_get(
            rt_chain(p["words"], 1)))).view(np.uint8)[:N]
        RESULTS[f"parity_rt_{dn}"] = bool(
            np.array_equal(o1, datasets[dn]))
        print(f"parity rt/{dn}: {RESULTS[f'parity_rt_{dn}']}", flush=True)

    def time_chain(w, inner=6, reps=3):
        jax.device_get(rt_chain(w, 1).ravel()[-1])
        jax.device_get(rt_chain(w, 1 + inner).ravel()[-1])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.device_get(rt_chain(w, 1).ravel()[-1])
            t1 = time.perf_counter()
            jax.device_get(rt_chain(w, 1 + inner).ravel()[-1])
            t2 = time.perf_counter()
            ts.append(((t2 - t1) - (t1 - t0)) / inner)
        return max(float(np.median(ts)), 1e-9)

    for cyc in range(CYCLES):
        for vname, fn in variants.items():
            for dn in datasets:
                try:
                    _, t = timed(lambda: fn(prepped[dn]),
                                 reps=(3 if cyc == 0 else 1))
                except Exception:
                    print(f"{vname}/{dn}: RUN FAILED", flush=True)
                    continue
                r = N / 1e9 / t
                RESULTS.setdefault(f"{vname}_{dn}", []).append(round(r, 1))
                print(f"cycle {cyc} {vname}/{dn}: {r:.1f} GB/s",
                      flush=True)
        # encode + chained pair, for context
        for dn in datasets:
            _, t = timed(lambda: fl_dense_pallas.fl_encode_dense_pallas(
                prepped[dn]["words"], nf, tile_r=256),
                reps=(3 if cyc == 0 else 1))
            RESULTS.setdefault(f"enc_256_{dn}", []).append(
                round(N / 1e9 / t, 1))
            t = time_chain(prepped[dn]["words"],
                           reps=(3 if cyc == 0 else 1))
            RESULTS.setdefault(f"rt_pair_{dn}", []).append(
                round(2 * N / 1e9 / t, 1))
            print(f"cycle {cyc} enc/rt {dn}: "
                  f"{RESULTS[f'enc_256_{dn}'][-1]} / "
                  f"{RESULTS[f'rt_pair_{dn}'][-1]} GB/s", flush=True)

    print(json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
