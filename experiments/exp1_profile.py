"""Stage-level profiling of the FL device codec on the real chip.

One process, many timed jitted stages — avoids per-process TPU claim
latency.  Results guide which stages become Pallas kernels.
"""

import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from fl_rl_compression_mpi_tpu.cli import _enable_compile_cache
from fl_rl_compression_mpi_tpu.ops import fl_jax
from fl_rl_compression_mpi_tpu.ops.fl_jax import (
    _frame_counts, _pack_variant, _required_bits, _unpack_variant)

_enable_compile_cache()

MB = 1 << 20
N = 256 * MB
L = 128
G = L // 8


def bench(name, fn, *args, reps=5, nbytes=N):
    fn_j = jax.jit(fn)
    out = jax.block_until_ready(fn_j(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn_j(*args))
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts))
    print(f"{name:34s} {t*1e3:9.2f} ms   {nbytes/1e9/t:8.1f} GB/s",
          flush=True)
    return out


rng = np.random.default_rng(0)
host = rng.integers(0, 16, N, np.uint8)
data = jax.device_put(jnp.asarray(host))
nn = jnp.int32(N)
F = N // L

print(f"== input {N//MB} MiB, {F} frames, device {jax.devices()[0]}",
      flush=True)

# --- encode stages ---------------------------------------------------------

def stage_bits(d, n):
    idx = jnp.arange(N, dtype=jnp.int32)
    d = jnp.where(idx < n, d, 0)
    frames = d.reshape(F, L).astype(jnp.int32)
    return _required_bits(frames.max(axis=1))

bits = bench("bits (widen+max+clz)", stage_bits, data, nn)

def stage_pack_one(d):
    frames = d.reshape(F, L).astype(jnp.int32)
    groups = frames.reshape(F, G, 8)
    return _pack_variant(groups, 4)

bench("pack single variant b=4", stage_pack_one, data)

def stage_pack_all(d, bits):
    frames = d.reshape(F, L).astype(jnp.int32)
    groups = frames.reshape(F, G, 8)
    b32 = bits.astype(jnp.int32)
    units = jnp.zeros((F, 8, G), jnp.int32)
    for b in range(1, 9):
        pk = _pack_variant(groups, b)
        pku = pk.reshape(F, b, G)
        pku = jnp.pad(pku, ((0, 0), (0, 8 - b), (0, 0)))
        units = jnp.where((b32 == b)[:, None, None], pku, units)
    return units

units = bench("pack all variants + select", stage_pack_all, data, bits)

def stage_scatter(units, bits, n):
    counts = _frame_counts(n, F, L)
    b32 = bits.astype(jnp.int32)
    nb = (counts * b32 + 7) // 8
    ub = (nb + G - 1) // G
    offu = jnp.cumsum(ub) - ub
    units_pad = N // G + 1
    u_ix = jnp.arange(8, dtype=jnp.int32)[None, :]
    tgt = jnp.where(u_ix < ub[:, None], offu[:, None] + u_ix, units_pad)
    stream = (jnp.zeros((units_pad, G), jnp.int32)
              .at[tgt].set(units, mode="drop"))
    return stream

bench("unit scatter (placement)", stage_scatter, units, bits, nn)

def stage_cumsum(bits, n):
    counts = _frame_counts(n, F, L)
    nb = (counts * bits.astype(jnp.int32) + 7) // 8
    return jnp.cumsum(nb)

bench("frame cumsum only", stage_cumsum, bits, nn, nbytes=F * 4)

enc = bench("ENCODE total", lambda d, n: fl_jax.fl_encode(d, n), data, nn)

# --- decode stages ---------------------------------------------------------

bits_d, values_d = enc.bits, enc.values

def stage_gather_units(bits, values, n):
    counts = _frame_counts(n, F, L)
    b_arr = jnp.where(counts > 0, bits.astype(jnp.int32), 0)
    nb = (counts * b_arr + 7) // 8
    ub = (nb + G - 1) // G
    offu = jnp.cumsum(ub) - ub
    units_pad = N // G
    stream = values.reshape(units_pad, G).astype(jnp.int32)
    u_ix = jnp.arange(8, dtype=jnp.int32)[None, :]
    src = jnp.clip(offu[:, None] + u_ix, 0, units_pad - 1)
    units = stream[src]
    return jnp.where((u_ix < ub[:, None])[:, :, None], units, 0)

units2 = bench("unit gather", stage_gather_units, bits_d, values_d, nn)

def stage_gather_units_u8(bits, values, n):
    counts = _frame_counts(n, F, L)
    b_arr = jnp.where(counts > 0, bits.astype(jnp.int32), 0)
    nb = (counts * b_arr + 7) // 8
    ub = (nb + G - 1) // G
    offu = jnp.cumsum(ub) - ub
    units_pad = N // G
    stream = values.reshape(units_pad, G)  # stay u8
    u_ix = jnp.arange(8, dtype=jnp.int32)[None, :]
    src = jnp.clip(offu[:, None] + u_ix, 0, units_pad - 1)
    return stream[src]

bench("unit gather (u8 rows)", stage_gather_units_u8, bits_d, values_d, nn)

def stage_unpack_all(units, bits, n):
    counts = _frame_counts(n, F, L)
    b_arr = jnp.where(counts > 0, bits.astype(jnp.int32), 0)
    out = jnp.zeros((F, G, 8), jnp.int32)
    for b in range(1, 9):
        chunk_b = units[:, :b, :].reshape(F, G, b)
        el = _unpack_variant(chunk_b, b)
        out = jnp.where((b_arr == b)[:, None, None], el, out)
    return out

bench("unpack all variants + select", stage_unpack_all, units2, bits_d, nn)

def decode_old(bits, values, n):
    """Previous decode: closed-form two-byte gather per output byte."""
    counts = _frame_counts(n, F, L)
    b = jnp.where(counts > 0, bits.astype(jnp.int32), 0)
    nb = (counts * b + 7) // 8
    offsets = jnp.cumsum(nb) - nb
    i_in = jnp.arange(L, dtype=jnp.int32)[None, :]
    bitpos = i_in * b[:, None]
    byte_idx = offsets[:, None] + (bitpos >> 3)
    bit_off = bitpos & 7
    v32 = values.astype(jnp.int32)
    fb = jnp.clip(byte_idx.reshape(-1), 0, N - 1)
    fn_ = jnp.clip(byte_idx.reshape(-1) + 1, 0, N - 1)
    lo = v32[fb].reshape(F, L) >> bit_off
    hi = v32[fn_].reshape(F, L) << (8 - bit_off)
    mask = (1 << b[:, None]) - 1
    out = ((lo | hi) & mask).reshape(-1)
    idx = jnp.arange(N, dtype=jnp.int32)
    return jnp.where(idx < n, out, 0).astype(jnp.uint8)

out_old = bench("DECODE old (2-byte gather)", decode_old, bits_d,
                values_d, nn)

out_new = bench("DECODE new (unit gather)",
                lambda b, v, n: fl_jax.fl_decode(b, v, n),
                bits_d, values_d, nn)

def decode_hybrid(bits, values, n):
    """Unit gather + closed-form two-byte extraction within padded rows."""
    counts = _frame_counts(n, F, L)
    b_arr = jnp.where(counts > 0, bits.astype(jnp.int32), 0)
    nb = (counts * b_arr + 7) // 8
    ub = (nb + G - 1) // G
    offu = jnp.cumsum(ub) - ub
    units_pad = N // G
    stream = values.reshape(units_pad, G).astype(jnp.int32)
    u_ix = jnp.arange(8, dtype=jnp.int32)[None, :]
    src = jnp.clip(offu[:, None] + u_ix, 0, units_pad - 1)
    rows = stream[src].reshape(F, 8 * G)          # padded packed rows
    rows = jnp.concatenate([rows, jnp.zeros((F, 1), jnp.int32)], axis=1)
    i_in = jnp.arange(L, dtype=jnp.int32)[None, :]
    bitpos = i_in * b_arr[:, None]
    B = bitpos >> 3
    s = bitpos & 7
    lo = jnp.take_along_axis(rows, B, axis=1) >> s
    hi = jnp.take_along_axis(rows, B + 1, axis=1) << (8 - s)
    mask = (1 << b_arr[:, None]) - 1
    out = ((lo | hi) & mask).reshape(-1)
    idx = jnp.arange(N, dtype=jnp.int32)
    return jnp.where(idx < n, out, 0).astype(jnp.uint8)

out_h = bench("DECODE hybrid (unit+2byte)", decode_hybrid, bits_d,
              values_d, nn)

ok_old = bool(jnp.array_equal(out_old[:N], data))
ok_new = bool(jnp.array_equal(out_new[:N], data))
ok_h = bool(jnp.array_equal(out_h[:N], data))
print("roundtrips: old", ok_old, "new", ok_new, "hybrid", ok_h, flush=True)
