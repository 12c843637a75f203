"""Microbenchmarks: what do flat gathers / scans / elementwise chains cost
on this chip?  Calibrates the u32-word codec design."""

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
N = 256 * MB           # bytes
NW = N // 4            # u32 words


def bench(name, fn, *args, reps=5, nbytes=N):
    fn_j = jax.jit(fn)
    jax.block_until_ready(fn_j(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn_j(*args))
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts))
    print(f"{name:38s} {t*1e3:9.3f} ms   {nbytes/1e9/t:8.1f} GB/s(in)",
          flush=True)


rng = np.random.default_rng(0)
words = jax.device_put(jnp.asarray(
    rng.integers(0, 1 << 32, NW, np.uint32).astype(np.uint32)))
fwd_idx = jax.device_put(jnp.arange(NW, dtype=jnp.int32))
# structured indices: roughly monotone with small jitter (like compaction)
near_idx = jax.device_put(jnp.asarray(
    np.clip(np.arange(NW) + rng.integers(-4, 5, NW), 0, NW - 1)
    .astype(np.int32)))
rand_idx = jax.device_put(jnp.asarray(
    rng.integers(0, NW, NW, np.int64).astype(np.int32)))

print(f"== {N//MB} MiB / {NW} words on {jax.devices()[0]}", flush=True)

bench("copy u32 (read+write)", lambda w: w + jnp.uint32(1), words)
bench("copy u8 N", lambda w: w + jnp.uint8(1),
      jax.device_put(jnp.zeros(N, jnp.uint8)))

def chain10(w):
    x = w
    for k in range(10):
        x = (x >> 3) ^ (x + jnp.uint32(k)) & jnp.uint32(0xFFFF00FF)
    return x

bench("10-op elementwise chain u32", chain10, words)

def chain40(w):
    x = w
    for k in range(40):
        x = (x >> 3) ^ (x + jnp.uint32(k)) & jnp.uint32(0xFFFF00FF)
    return x

bench("40-op elementwise chain u32", chain40, words)

bench("gather u32 identity idx", lambda w, i: w[i], words, fwd_idx)
bench("gather u32 near-monotone idx", lambda w, i: w[i], words, near_idx)
bench("gather u32 random idx", lambda w, i: w[i], words, rand_idx)
bench("gather u32 half (N/2 idx)", lambda w, i: w[i], words,
      near_idx[::2], nbytes=N // 2)

def scat(w, i):
    return jnp.zeros(NW, jnp.uint32).at[i].set(w, mode="drop")

bench("scatter u32 near-monotone", scat, words, near_idx)

bench("cumsum i32 full N words", lambda w: jnp.cumsum(
    w.astype(jnp.int32)), words)
F = N // 128
bench("cumsum i32 F frames", lambda b: jnp.cumsum(b),
      jax.device_put(jnp.ones(F, jnp.int32)), nbytes=F * 4)

# widen/narrow costs
bench("u8 -> i32 widen", lambda d: d.astype(jnp.int32),
      jax.device_put(jnp.zeros(N, jnp.uint8)))
bench("bitcast u8 view -> u32", lambda d: jax.lax.bitcast_convert_type(
    d.reshape(NW, 4), jnp.uint32), jax.device_put(jnp.zeros(N, jnp.uint8)))

# variable-shift throughput (the codec's core op)
shifts = jax.device_put(jnp.asarray(
    rng.integers(0, 8, NW, np.int64).astype(np.uint32)))

def varshift(w, s):
    return (w << s) | (w >> (jnp.uint32(32) - s))

bench("variable shift (funnel-ish)", varshift, words, shifts)
