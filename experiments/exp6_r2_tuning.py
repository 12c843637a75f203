"""Round-2 chip tuning session (run on the real TPU, ONE process).

Questions this answers (VERDICT r1 items 2 and 6):
  a. practical HBM ceiling: a pure copy Pallas kernel (read N write N) —
     the honest yardstick the codec kernels should approach;
  b. tile_r sweep for encode/decode (1 MiB default vs larger pipelines);
  c. decode variants: variable-shift (current) vs constant-shift+select;
  d. "parallel" vs "arbitrary" grid dimension semantics;
  e. H2D / D2H transfer rates through the tunnel (end-to-end honesty);
  f. shard_map (1-chip mesh) overhead vs the bare kernel.

Usage: timeout 1700 python experiments/exp6_r2_tuning.py
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
from fl_rl_compression_mpi_tpu.ops import fl_jax, fl_pallas
from fl_rl_compression_mpi_tpu.ops.fl_pallas import LANES, _tail_mask

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


# -- data -------------------------------------------------------------------
rng = np.random.default_rng(0)
host = rng.integers(0, 16, N, np.uint8)
words = jax.device_put(jnp.asarray(host.view(np.uint32)))
nn = jnp.int32(N)
print("data staged", flush=True)

# -- a. copy ceiling --------------------------------------------------------


def copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


@functools.partial(jax.jit, static_argnames=("tile_r", "sem"))
def copy_pallas(x, tile_r=2048, sem="arbitrary"):
    nw = x.shape[0]
    grid = nw // (tile_r * LANES)
    return pl.pallas_call(
        copy_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nw // LANES, LANES), jnp.uint32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=(sem,)),
    )(x.reshape(nw // LANES, LANES))


for tr in (1024, 2048, 4096, 8192):
    _, t = timed(lambda: copy_pallas(words, tile_r=tr))
    RESULTS[f"copy_tile{tr}"] = round(gbps(t), 1)
    print(f"copy tile_r={tr}: {gbps(t):.1f} GB/s-in", flush=True)
_, t = timed(lambda: copy_pallas(words, tile_r=2048, sem="parallel"))
RESULTS["copy_tile2048_parallel"] = round(gbps(t), 1)
print(f"copy parallel: {gbps(t):.1f}", flush=True)

# -- b. encode / decode tile sweep -----------------------------------------
frames = N // 128
for tr in (1024, 2048, 4096, 8192):
    (bits_d, fields_d), t = timed(
        lambda: fl_pallas.fl_encode_fields_pallas(words, nn, frame_length=128, tile_r=tr))
    RESULTS[f"enc_tile{tr}"] = round(gbps(t), 1)
    print(f"encode tile_r={tr}: {gbps(t):.1f} GB/s", flush=True)

bits_h = np.asarray(jax.device_get(bits_d)).reshape(-1)[:frames]
bits2d = jax.device_put(jnp.asarray(
    np.ascontiguousarray(bits_h).reshape(N // 4 // 128, 128 // 32)))
for tr in (1024, 2048, 4096, 8192):
    out_w, t = timed(
        lambda: fl_pallas.fl_decode_fields_pallas(fields_d, bits2d, nn, frame_length=128, tile_r=tr))
    RESULTS[f"dec_tile{tr}"] = round(gbps(t), 1)
    print(f"decode tile_r={tr}: {gbps(t):.1f} GB/s", flush=True)
ok = bool(np.array_equal(
    np.asarray(jax.device_get(out_w)).view(np.uint8)[:N], host))
print("decode roundtrip ok:", ok, flush=True)
RESULTS["roundtrip_ok"] = ok

# -- c. decode const-shift variant -----------------------------------------


def _decode_kernel_constshift(wpf, tile_r):
    fpr = LANES // wpf

    def kernel(n_ref, f_ref, bits_ref, out_ref):
        i = pl.program_id(0)
        n = n_ref[0, 0]
        f = f_ref[...].astype(jnp.uint32)
        b4 = bits_ref[...].astype(jnp.int32).astype(jnp.float32)
        selT = (jax.lax.broadcasted_iota(jnp.int32, (fpr, LANES), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (fpr, LANES), 1)
                // wpf).astype(jnp.float32)
        b = jnp.dot(b4, selT,
                    preferred_element_type=jnp.float32).astype(jnp.int32)
        w = f
        for bb in range(1, 8):
            mask = jnp.uint32((1 << bb) - 1)
            un = ((f & mask) | (((f >> bb) & mask) << 8)
                  | (((f >> (2 * bb)) & mask) << 16)
                  | (((f >> (3 * bb)) & mask) << 24))
            w = jnp.where(b == bb, un, w)
        out_ref[...] = w & _tail_mask(n, i * tile_r * LANES, tile_r)
    return kernel


@functools.partial(jax.jit, static_argnames=("tile_r",))
def decode_constshift(fields, bits2d, n, tile_r=2048):
    nw = fields.shape[0]
    grid = nw // (tile_r * LANES)
    n2 = jnp.asarray(n, jnp.int32).reshape(1, 1)
    return pl.pallas_call(
        _decode_kernel_constshift(32, tile_r),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nw // LANES, LANES), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(n2, fields.reshape(nw // LANES, LANES), bits2d)


for tr in (2048, 4096, 8192):
    out2, t = timed(lambda: decode_constshift(fields_d, bits2d, nn, tile_r=tr))
    RESULTS[f"dec_constshift_tile{tr}"] = round(gbps(t), 1)
    print(f"decode constshift tile_r={tr}: {gbps(t):.1f} GB/s", flush=True)
print("constshift ok:",
      bool(np.array_equal(np.asarray(jax.device_get(out2)).view(
          np.uint8)[:N], host)), flush=True)

# -- e. transfer rates ------------------------------------------------------
t0 = time.perf_counter()
arr = jax.device_put(jnp.asarray(host.view(np.uint32)))
fence(arr)
t_h2d = time.perf_counter() - t0
RESULTS["h2d_gbps"] = round(gbps(t_h2d), 3)
print(f"H2D 256MB: {gbps(t_h2d):.3f} GB/s", flush=True)

t0 = time.perf_counter()
back = np.asarray(jax.device_get(fields_d))
t_d2h = time.perf_counter() - t0
RESULTS["d2h_gbps"] = round(gbps(t_d2h), 3)
print(f"D2H 256MB: {gbps(t_d2h):.3f} GB/s", flush=True)

# -- f. shard_map overhead (1-chip mesh) ------------------------------------
from fl_rl_compression_mpi_tpu.parallel import dist

mesh = dist.make_mesh(1)
words2d = words.reshape(1, -1)
ns1 = jnp.asarray(np.asarray([N], np.int64), jnp.int32)
(_, _), t = timed(lambda: dist.fl_compress_sharded(mesh, words2d, ns1))
RESULTS["sharded_enc_gbps"] = round(gbps(t), 1)
print(f"sharded encode (1-chip mesh): {gbps(t):.1f} GB/s", flush=True)

best_enc = max((v, k) for k, v in RESULTS.items() if k.startswith("enc_"))
RESULTS["sharded_eff"] = round(RESULTS["sharded_enc_gbps"] / best_enc[0], 3)

print(json.dumps(RESULTS), flush=True)
