"""Placement-primitive benchmarks: what can move ragged data fast?

Calibrated timing (device_get sync, latency-subtracted).  Candidates:
row-gather of 128B rows, dynamic_slice chains, scan-of-DMA, one-hot matmul
permutation, log-shift compaction rounds.
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
R = N // 128          # 128-byte rows

LAT = 0.0


def bench(name, fn, *args, reps=5, nbytes=N):
    global LAT
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    first = out[0] if isinstance(out, tuple) else out
    jax.device_get(first.ravel()[-1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        o = fn_j(*args)
        f = o[0] if isinstance(o, tuple) else o
        jax.device_get(f.ravel()[-1])
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts))
    eff = max(t - LAT, 1e-9)
    print(f"{name:44s} {t*1e3:9.3f} ms  eff {eff*1e3:8.3f} ms "
          f"{nbytes/1e9/eff:8.1f} GB/s", flush=True)
    return t


rng = np.random.default_rng(0)
tiny = jax.device_put(jnp.arange(128, dtype=jnp.uint32))
LAT = bench("LATENCY floor", lambda t: t + jnp.uint32(1), tiny, nbytes=512)

rows_i32 = jax.device_put(jnp.asarray(
    rng.integers(0, 1 << 31, (R, 32), np.int64).astype(np.int32)))
ridx = jax.device_put(jnp.asarray(
    np.clip(np.arange(R) + rng.integers(-4, 5, R), 0, R - 1)
    .astype(np.int32)))

bench("row-gather (R,32)i32 128B rows", lambda w, i: w[i], rows_i32, ridx)
bench("row-gather (R/8,256)i32 1KB rows", lambda w, i: w[i],
      rows_i32.reshape(R // 8, 256), ridx[::8])
bench("take axis0 (R,32)", lambda w, i: jnp.take(w, i, axis=0),
      rows_i32, ridx)

words = rows_i32.reshape(-1)

# dynamic_slice chain: K slices of N/K words each at dynamic offsets
def dyn_slices(w, offs):
    K = offs.shape[0]
    S = NW // 64
    parts = [jax.lax.dynamic_slice(w, (offs[k],), (S,)) for k in range(64)]
    return jnp.concatenate(parts)

offs64 = jax.device_put(jnp.asarray(
    (rng.integers(0, NW - NW // 64, 64)).astype(np.int32)))
bench("64 dynamic_slices of 4MB each", dyn_slices, words, offs64)

def dus_chain(w, offs):
    out = jnp.zeros(NW, jnp.int32)
    S = NW // 64
    for k in range(64):
        out = jax.lax.dynamic_update_slice(
            out, jax.lax.dynamic_slice(w, (offs[k],), (S,)),
            (offs[k],))
    return out

bench("64 dyn_slice+dyn_update_slice 4MB", dus_chain, words, offs64)

# scan of small dynamic slices (frame-ish granularity): 8192 x 8KB
def scan_dma(w, offs):
    S = 2048  # words = 8KB

    def body(carry, off):
        part = jax.lax.dynamic_slice(w, (off,), (S,))
        return carry + part[0], part[7]

    c, ys = jax.lax.scan(body, jnp.int32(0), offs)
    return ys

offs8k = jax.device_put(jnp.asarray(
    rng.integers(0, NW - 2048, 8192).astype(np.int32)))
bench("scan 8192 dyn_slices 8KB", scan_dma, words, offs8k,
      nbytes=8192 * 8192)

# one-hot permutation matmul on (rows,128) f32 tiles
mat = jax.device_put(jnp.asarray(
    rng.random((R // 8, 128), np.float32), jnp.bfloat16))
perm = jax.device_put(jnp.asarray(
    np.eye(128, dtype=np.float32), jnp.bfloat16))
bench("(R/8,128)@(128,128) bf16 matmul",
      lambda x, p: jnp.dot(x, p, preferred_element_type=jnp.float32),
      mat, perm, nbytes=R // 8 * 128)

# log-shift compaction round cost: select+roll passes on full N words
def logshift_rounds(w, k):
    x = w
    for r in range(k):
        shifted = jnp.roll(x, -(1 << r))
        x = jnp.where((x & 1) == 0, shifted, x)
    return x

bench("8 roll+select rounds N words", logshift_rounds, words, 8)
bench("1 roll+select round N words",
      lambda w: jnp.where((w & 1) == 0, jnp.roll(w, -4), w), words)

# repeat (per-frame scalar -> per-element) broadcast cost
bits = jax.device_put(jnp.asarray(
    rng.integers(1, 9, R, np.int64).astype(np.int32)))
bench("repeat F->N/4 broadcast",
      lambda b: jnp.repeat(b, 32, total_repeat_length=NW), bits)
