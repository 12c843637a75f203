"""Microbenchmarks v2 — forced-materialization timing.

block_until_ready appears unreliable on the tunneled platform (copies showed
>2 TB/s on 819 GB/s HBM).  Here every timed call is followed by a
device_get of one element of the result, which cannot complete before the
result buffer exists.  The per-call tunnel latency is measured separately
and subtracted.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from fl_rl_compression_mpi_tpu.cli import _enable_compile_cache
_enable_compile_cache()

MB = 1 << 20
N = 256 * MB
NW = N // 4

LAT = None


def bench(name, fn, *args, reps=5, nbytes=N):
    global LAT
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    sync = (lambda o: jax.device_get(o[0][-1]) if isinstance(o, tuple)
            else jax.device_get(o[-1]))
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn_j(*args))
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts))
    lat = LAT or 0.0
    eff = max(t - lat, 1e-9)
    print(f"{name:40s} {t*1e3:9.3f} ms   {nbytes/1e9/eff:8.1f} GB/s(in)",
          flush=True)
    return t


rng = np.random.default_rng(0)
words = jax.device_put(jnp.asarray(
    rng.integers(0, 1 << 32, NW, np.int64).astype(np.uint32)))
tiny = jax.device_put(jnp.arange(128, dtype=jnp.uint32))

print(f"== {N//MB} MiB / {NW} words on {jax.devices()[0]}", flush=True)
LAT = bench("LATENCY (tiny op + 1-elem pull)",
            lambda t: t + jnp.uint32(1), tiny, nbytes=512)
print(f"   latency floor = {LAT*1e3:.3f} ms", flush=True)

bench("copy u32 (read+write)", lambda w: w + jnp.uint32(1), words)

def chain10(w):
    x = w
    for k in range(10):
        x = (x >> 3) ^ ((x + jnp.uint32(k)) & jnp.uint32(0xFFFF00FF))
    return x

bench("10-op chain u32", chain10, words)

def chain40(w):
    x = w
    for k in range(40):
        x = (x >> 3) ^ ((x + jnp.uint32(k)) & jnp.uint32(0xFFFF00FF))
    return x

bench("40-op chain u32", chain40, words)

near_idx = jax.device_put(jnp.asarray(
    np.clip(np.arange(NW) + rng.integers(-4, 5, NW), 0, NW - 1)
    .astype(np.int32)))
rand_idx = jax.device_put(jnp.asarray(
    rng.integers(0, NW, NW, np.int64).astype(np.int32)))

bench("gather u32 near-monotone NW idx", lambda w, i: w[i], words, near_idx)
bench("gather u32 random NW idx", lambda w, i: w[i], words, rand_idx)
bench("gather u32 NW/4 idx", lambda w, i: w[i], words, near_idx[::4],
      nbytes=N // 4)

def scat(w, i):
    return jnp.zeros(NW, jnp.uint32).at[i].set(w, mode="drop")

bench("scatter u32 near-monotone", scat, words, near_idx)

bench("cumsum u32 N words", lambda w: jnp.cumsum(w), words)

# gather from a small (VMEM-size) table
small = jax.device_put(jnp.asarray(
    rng.integers(0, 1 << 32, 1 << 16, np.int64).astype(np.uint32)))
small_idx = jax.device_put(jnp.asarray(
    rng.integers(0, 1 << 16, NW, np.int64).astype(np.int32)))
bench("gather u32 from 256KB table", lambda w, i: w[i], small, small_idx)

# two-level strategy: gather 4 consecutive words per index (emulated by 4
# gathers with +0..3) — tests whether wider payloads amortize
idx4 = near_idx[::4] & ~jnp.int32(3)

def gather4(w, i):
    return (w[i], w[i + 1], w[i + 2], w[i + 3])

t = bench("gather 4x consecutive (NW total)", gather4, words, idx4)

# variable funnel shift
shifts = jax.device_put(jnp.asarray(
    rng.integers(1, 31, NW, np.int64).astype(np.uint32)))
bench("funnel shift varamount", lambda w, s: (w >> s) | (w << (32 - s)),
      words, shifts)
