"""Round-2: (a) RL encode round-reduction A/B — old kernel (global
suffix-min, 32-row lookahead, full-ladder merge shift) vendored here vs
the optimized production kernel (256-bounded suffix-min, 8-row lookahead,
lane-only merge shift); (b) production FL chain with bf16 matmuls;
(c) copy-chain ceiling: two trivial copy kernels chained in the same
fori_loop harness — the honest upper bound the chain harness can report.

Usage: timeout 1700 python experiments/exp18_rl_rounds.py
"""

import functools
import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fl_rl_compression_mpi_tpu.cli import _enable_compile_cache
from fl_rl_compression_mpi_tpu.ops import fl_pallas, rl_pallas, rl_numpy
from fl_rl_compression_mpi_tpu.ops import lanes
from fl_rl_compression_mpi_tpu.ops.lanes import (
    LANES, flat_idx, flat_shift_down, flat_shift_up)

_enable_compile_cache()
RESULTS = {}
_I32MAX = 2 ** 31 - 1


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


# --------------------------------------------------------------- RL data
N = 64 << 20
rng = np.random.default_rng(0)
nruns = N // 32
LONG = np.repeat(rng.integers(0, 256, nruns, np.uint8),
                 rng.integers(16, 112, nruns))[:N].copy()
SHORT = np.repeat(rng.integers(0, 256, N // 3, np.uint8),
                  rng.integers(2, 7, N // 3))[:N].copy()
assert LONG.size == N and SHORT.size == N


# ------------------------------------------------- vendored OLD encoder
def _encode_kernel_old(R, sub, grid, LOOK):
    E = R + LOOK
    nbits = (sub * LANES - 1).bit_length()
    _iota = lambda s, d: jax.lax.broadcasted_iota(jnp.int32, s, d)

    def kernel(n_ref, xm_ref, xl_ref, out_ref, total_ref,
               carry, carry_row, merged, sem):
        i = pl.program_id(0)
        n = n_ref[0]

        @pl.when(i == 0)
        def _():
            carry[0] = -1
            carry[1] = 0
            carry[2] = 0
            carry_row[...] = jnp.zeros((1, LANES), jnp.int32)

        xm = xm_ref[...].astype(jnp.int32)
        xl = xl_ref[...].astype(jnp.int32)
        xe = jnp.concatenate([xm, xl], axis=0)
        base = i * R * LANES
        fidx = flat_idx(E)
        gidx = base + fidx

        prev = flat_shift_up(xe, 1, 0)
        prev = jnp.where(fidx == 0, carry[0], prev)
        s = (xe != prev) | (gidx == n)
        ls = lanes.prefix_max_flat(jnp.where(s, gidx, -1))
        ls = jnp.maximum(ls, carry[1])
        d = gidx - ls
        pflag = s | (d % 255 == 0)
        nxt = flat_shift_down(
            lanes.suffix_min_flat(jnp.where(pflag, gidx, _I32MAX)),
            1, _I32MAX)
        nxt = jnp.minimum(nxt, n)
        cnt = nxt - gidx
        keep = pflag & (gidx < n) & (_iota((E, LANES), 0) < R)
        psum = lanes.prefix_sum_flat(keep.astype(jnp.int32))
        payload16 = (xe & jnp.int32(0xFF)) | ((cnt & jnp.int32(0xFF)) << 8)

        cc = carry[2] % LANES
        out_row = carry[2] // LANES
        sub_idx = flat_idx(sub)
        sh = jnp.where((_iota((R + 8, LANES), 0) == 0)
                       & (_iota((R + 8, LANES), 1) < cc),
                       carry_row[...], jnp.int32(0))
        kprev = jnp.int32(0)
        for h in range(R // sub):
            lo = h * sub
            keep_h = keep[lo:lo + sub]
            psum_h = psum[lo:lo + sub]
            dist_h = sub_idx - (psum_h - kprev - 1)
            w = lanes.pack_route(keep_h, dist_h, payload16[lo:lo + sub])
            wc = lanes.compact_lsb(w, nbits) & jnp.int32(0xFFFF)
            part = jnp.concatenate(
                [wc, jnp.zeros((R + 8 - sub, LANES), jnp.int32)], axis=0)
            sh = sh | lanes.flat_shift_up_dyn(part, cc + kprev, 0)
            kprev = jnp.max(psum_h)
        K = kprev

        rows_used = jnp.maximum((cc + K + LANES - 1) // LANES, 1)
        BUCKETS = rl_pallas._EMIT_BUCKETS(R)
        bid = jnp.int32(0)
        for Bk in BUCKETS[:-1]:
            bid = bid + (rows_used > Bk).astype(jnp.int32)

        @pl.when(i > 0)
        def _():
            for bi, Bk in enumerate(BUCKETS):
                @pl.when(carry[3] == bi)
                def _(Bk=Bk):
                    pltpu.make_async_copy(
                        merged.at[:Bk], out_ref.at[pl.ds(out_row, Bk)],
                        sem).wait()
        merged[...] = sh
        for bi, Bk in enumerate(BUCKETS):
            @pl.when(bid == bi)
            def _(Bk=Bk):
                pltpu.make_async_copy(
                    merged.at[:Bk], out_ref.at[pl.ds(out_row, Bk)],
                    sem).start()
        carry[3] = bid

        @pl.when(i == grid - 1)
        def _():
            for bi, Bk in enumerate(BUCKETS):
                @pl.when(bid == bi)
                def _(Bk=Bk):
                    pltpu.make_async_copy(
                        merged.at[:Bk], out_ref.at[pl.ds(out_row, Bk)],
                        sem).wait()

        p = (cc + K) // LANES
        carry_row[...] = jnp.sum(
            jnp.where(_iota((R + 8, LANES), 0) == p, sh, 0),
            axis=0, keepdims=True)
        carry[2] = carry[2] + K
        carry[0] = xm[R - 1, LANES - 1]
        carry[1] = ls[R - 1, LANES - 1]
        total_ref[0] = carry[2]
    return kernel


@functools.partial(jax.jit, static_argnames=("tile_rows", "look"))
def rl_encode_old(x2d, n, tile_rows=256, look=32):
    R = tile_rows
    sub = R
    rows = x2d.shape[0]
    grid = rows // R
    nblk = rows // look
    packed, total = pl.pallas_call(
        _encode_kernel_old(R, sub, grid, look),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((R, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (look, LANES),
                lambda i, look=look, R=R, nblk=nblk: (
                    jnp.minimum((i + 1) * (R // look), nblk - 1), 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows + R + 8, LANES), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((4,), jnp.int32),
            pltpu.VMEM((1, LANES), jnp.int32),
            pltpu.VMEM((R + 8, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(jnp.asarray(n, jnp.int32).reshape(1), x2d, x2d)
    return packed.reshape(-1), total[0]


def run_rl():
    for name, host in (("long", LONG), ("short", SHORT)):
        x2d = jax.device_put(jnp.asarray(host).reshape(-1, LANES))
        nn = jnp.int32(N)
        # golden pieces
        cg, vg = rl_numpy.encode(host)

        (p_new, t_new), dt_new = timed(
            lambda: rl_pallas.rl_encode_pallas(x2d, nn), reps=5, inner=4)
        k = int(jax.device_get(t_new))
        pk = np.asarray(jax.device_get(p_new))[:k]
        ok_new = (k == cg.size
                  and np.array_equal((pk >> 8) & 0xFF, cg.astype(np.int64))
                  and np.array_equal(pk & 0xFF, vg.astype(np.int64)))
        RESULTS[f"rl_enc_new_{name}_gbps"] = round(N / 1e9 / dt_new, 2)
        RESULTS[f"rl_enc_new_{name}_ok"] = bool(ok_new)
        print(f"rl encode NEW {name}: {N/1e9/dt_new:.2f} GB/s ok={ok_new}",
              flush=True)

        try:
            (p_old, t_old), dt_old = timed(
                lambda: rl_encode_old(x2d, nn), reps=5, inner=4)
            ko = int(jax.device_get(t_old))
            po = np.asarray(jax.device_get(p_old))[:ko]
            ok_old = ko == k and np.array_equal(po, pk)
            RESULTS[f"rl_enc_old_{name}_gbps"] = round(N / 1e9 / dt_old, 2)
            RESULTS[f"rl_enc_old_{name}_ok"] = bool(ok_old)
            print(f"rl encode OLD {name}: {N/1e9/dt_old:.2f} GB/s "
                  f"ok={ok_old}", flush=True)
        except Exception:
            print(f"rl old {name}: FAILED\n{traceback.format_exc()[-400:]}",
                  flush=True)

        # decode (production, with window hint)
        counts_d, values_d = rl_pallas.rl_split_packed(p_new)
        rows_out = x2d.shape[0]
        win = rl_pallas.decode_window_rows(cg, rows_out)
        out, dt_dec = timed(
            lambda: rl_pallas.rl_decode_pallas(
                counts_d, values_d, t_new, rows_out, win_rows=win),
            reps=5, inner=4)
        ok_dec = bool(np.array_equal(
            np.asarray(jax.device_get(out)).reshape(-1)[:N], host))
        RESULTS[f"rl_dec_{name}_gbps"] = round(N / 1e9 / dt_dec, 2)
        RESULTS[f"rl_dec_{name}_ok"] = ok_dec
        print(f"rl decode {name} (win={win}): {N/1e9/dt_dec:.2f} GB/s "
              f"ok={ok_dec}", flush=True)


# ----------------------------------------------- FL chain + copy ceiling
NF = 256 << 20
gf = np.random.default_rng(1)
FHOST = gf.integers(0, 16, NF, np.uint8)
FWORDS = jax.device_put(jnp.asarray(FHOST.view(np.uint32)))
FROWS = (NF // 4) // LANES


def copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] + jnp.uint32(1)   # +1 defeats copy elision


def make_copy(tile_r):
    grid = FROWS // tile_r

    def go(w):
        return pl.pallas_call(
            copy_kernel, grid=(grid,),
            in_specs=[pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((FROWS, LANES), jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(w.reshape(FROWS, LANES))
    return go


def time_chain(step, reps=5, inner=24):
    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(w, k):
        return jax.lax.fori_loop(0, k, step, w)

    jax.device_get(chain(FWORDS, 1).ravel()[-1])
    jax.device_get(chain(FWORDS, 1 + inner).ravel()[-1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(chain(FWORDS, 1).ravel()[-1])
        t1 = time.perf_counter()
        jax.device_get(chain(FWORDS, 1 + inner).ravel()[-1])
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / inner)
    return 2 * NF / 1e9 / max(float(np.median(ts)), 1e-9)


def run_fl():
    nn = jnp.int32(NF)
    for et, dt in ((2048, 512), (2048, 1024)):
        def roundtrip(_, w, et=et, dt=dt):
            b, f = fl_pallas.fl_encode_fields_pallas(
                w, nn, frame_length=128, tile_r=et)
            return fl_pallas.fl_decode_fields_pallas(
                f, b, nn, frame_length=128, tile_r=dt)
        g = time_chain(roundtrip)
        RESULTS[f"fl_chain_bf16_{et}_{dt}"] = round(g, 1)
        print(f"fl chain bf16 {et}/{dt}: {g:.1f} GB/s", flush=True)

    for tr in (1024, 2048):
        cp = make_copy(tr)

        def step(_, w, cp=cp):
            return cp(cp(w).reshape(-1)).reshape(-1)
        g = time_chain(lambda i, w: step(i, w))
        RESULTS[f"copy_chain_{tr}"] = round(g, 1)
        print(f"copy chain @{tr}: {g:.1f} GB/s", flush=True)


for fn in (run_fl, run_rl):
    try:
        fn()
    except Exception:
        print(f"{fn.__name__} FAILED\n{traceback.format_exc()[-600:]}",
              flush=True)

print(json.dumps(RESULTS), flush=True)
