"""Round-2 chip session #2: maskless kernels + remaining measurements.

exp6 found: copy ceiling 353-455 GB/s-in (tile 4096 best; "parallel"
semantics helps), masked encode compute-bound at ~257 GB/s, encode tile
4096 OOMs scoped vmem at 16M.  This session measures:
  a. NEW maskless Horner encode / serial-shift decode at tiles
     {1024, 2048, 4096 (vmem raised)};
  b. decode const-shift variant (maskless) for comparison;
  c. H2D / D2H transfer rates;
  d. shard_map (1-chip mesh) overhead vs bare kernel;
  e. warm host fold/unfold rates in the same process (bench honesty).

Usage: timeout 1700 python experiments/exp7_r2_kernels.py
"""

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fl_rl_compression_mpi_tpu.cli import _enable_compile_cache
from fl_rl_compression_mpi_tpu.ops import fl_pallas
from fl_rl_compression_mpi_tpu.ops.fl_pallas import LANES

_enable_compile_cache()

N = 256 << 20
RESULTS = {}


def fence(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[-1])


def timed(fn, reps=5, inner=8):
    out = fn()
    fence(out)

    def batch(k):
        t0 = time.perf_counter()
        for _ in range(k):
            o = fn()
        fence(o)
        return time.perf_counter() - t0

    ts = []
    for _ in range(reps):
        t1 = batch(1)
        t2 = batch(1 + inner)
        ts.append((t2 - t1) / inner)
    return out, max(float(np.median(ts)), 1e-9)


def gbps(t):
    return N / 1e9 / t


rng = np.random.default_rng(0)
host = rng.integers(0, 16, N, np.uint8)
words = jax.device_put(jnp.asarray(host.view(np.uint32)))
nn = jnp.int32(N)
frames = N // 128
print("data staged", flush=True)

# -- a. new kernels ---------------------------------------------------------
for tr in (1024, 2048, 4096):
    try:
        (bits_d, fields_d), t = timed(
            lambda: fl_pallas.fl_encode_fields_pallas(
                words, nn, frame_length=128, tile_r=tr))
        RESULTS[f"enc_tile{tr}"] = round(gbps(t), 1)
        print(f"encode tile_r={tr}: {gbps(t):.1f} GB/s", flush=True)
    except Exception as e:
        print(f"encode tile_r={tr}: FAILED {str(e)[:120]}", flush=True)

bits_h = np.asarray(jax.device_get(bits_d)).reshape(-1)[:frames]
bits2d = jax.device_put(jnp.asarray(
    np.ascontiguousarray(bits_h).reshape(N // 4 // 128, 4)))
for tr in (1024, 2048, 4096):
    try:
        out_w, t = timed(
            lambda: fl_pallas.fl_decode_fields_pallas(
                fields_d, bits2d, nn, frame_length=128, tile_r=tr))
        RESULTS[f"dec_tile{tr}"] = round(gbps(t), 1)
        print(f"decode tile_r={tr}: {gbps(t):.1f} GB/s", flush=True)
    except Exception as e:
        print(f"decode tile_r={tr}: FAILED {str(e)[:120]}", flush=True)

ok = bool(np.array_equal(
    np.asarray(jax.device_get(out_w)).view(np.uint8)[:N], host))
print("roundtrip ok:", ok, flush=True)
RESULTS["roundtrip_ok"] = ok

# -- b. decode const-shift variant (maskless) -------------------------------


def _dec_constshift(tile_r):
    def kernel(f_ref, bits_ref, out_ref):
        f = f_ref[...].astype(jnp.uint32)
        b4 = bits_ref[...].astype(jnp.int32).astype(jnp.float32)
        selT = (jax.lax.broadcasted_iota(jnp.int32, (4, LANES), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (4, LANES), 1)
                // 32).astype(jnp.float32)
        b = jnp.dot(b4, selT,
                    preferred_element_type=jnp.float32).astype(jnp.int32)
        w = f
        for bb in range(1, 8):
            mask = jnp.uint32((1 << bb) - 1)
            un = ((f & mask) | (((f >> bb) & mask) << 8)
                  | (((f >> (2 * bb)) & mask) << 16)
                  | (((f >> (3 * bb)) & mask) << 24))
            w = jnp.where(b == bb, un, w)
        out_ref[...] = w
    return kernel


@functools.partial(jax.jit, static_argnames=("tile_r",))
def decode_constshift(fields, bits2d, tile_r=2048):
    nw = fields.shape[0]
    grid = nw // (tile_r * LANES)
    return pl.pallas_call(
        _dec_constshift(tile_r),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nw // LANES, LANES), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(fields.reshape(nw // LANES, LANES), bits2d)


for tr in (2048,):
    out2, t = timed(lambda: decode_constshift(fields_d, bits2d, tile_r=tr))
    RESULTS[f"dec_constshift_tile{tr}"] = round(gbps(t), 1)
    print(f"decode constshift tile_r={tr}: {gbps(t):.1f} GB/s", flush=True)
print("constshift ok:",
      bool(np.array_equal(np.asarray(jax.device_get(out2)).view(
          np.uint8)[:N], host)), flush=True)

# -- c. transfers -----------------------------------------------------------
t0 = time.perf_counter()
arr = jax.device_put(jnp.asarray(host.view(np.uint32)))
fence(arr)
RESULTS["h2d_gbps"] = round(gbps(time.perf_counter() - t0), 3)
print(f"H2D 256MB: {RESULTS['h2d_gbps']} GB/s", flush=True)

t0 = time.perf_counter()
_ = np.asarray(jax.device_get(fields_d))
RESULTS["d2h_gbps"] = round(gbps(time.perf_counter() - t0), 3)
print(f"D2H 256MB: {RESULTS['d2h_gbps']} GB/s", flush=True)

# -- d. shard_map overhead --------------------------------------------------
from fl_rl_compression_mpi_tpu.parallel import dist

mesh = dist.make_mesh(1)
words2d = words.reshape(1, -1)
ns1 = jnp.asarray(np.asarray([N], np.int64), jnp.int32)
(_, _), t = timed(lambda: dist.fl_compress_sharded(mesh, words2d, ns1))
RESULTS["sharded_enc_gbps"] = round(gbps(t), 1)
print(f"sharded encode (1-chip mesh): {gbps(t):.1f} GB/s", flush=True)

# -- e. host fold/unfold warm rates (same process) --------------------------
from fl_rl_compression_mpi_tpu.native import get_native
from fl_rl_compression_mpi_tpu.ops.fields import fold

nat = get_native()
if nat is not None:
    fields_h = np.asarray(jax.device_get(fields_d))[: frames * 32]
    values = nat.fl_fold(fields_h, bits_h, N, 128)   # warm-up
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        values = nat.fl_fold(fields_h, bits_h, N, 128)
        ts.append(time.perf_counter() - t0)
    RESULTS["fold_gbps"] = round(gbps(min(ts)), 2)
    nat.fl_unfold(values, bits_h, N, 128)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        nat.fl_unfold(values, bits_h, N, 128)
        ts.append(time.perf_counter() - t0)
    RESULTS["unfold_gbps"] = round(gbps(min(ts)), 2)
    print(f"fold {RESULTS['fold_gbps']} / unfold {RESULTS['unfold_gbps']} "
          f"GB/s", flush=True)

print(json.dumps(RESULTS), flush=True)
