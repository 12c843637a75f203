"""Round-2: RL decode round-reduction A/B (same session).

Production rl_pallas decode gained two changes (see rl_pallas.py):
double-buffered window prefetch (the next cursor depends only on the
current window, so its DMA overlaps the expansion) and a 256-span
BOUNDED hole-fill prefix-max (8 rounds vs the global lane ladder + row
doubling; seed moved to headroom slot HEAD-1 to keep the bound).

This A/B vendors the OLD decode kernel (single-buffered start+wait at
tile head, global prefix-max hole fill, seed at slot 0) and chains
encode→decode pairs (data-dependency serialization, credited 2N/pair)
on long-run and short-run streams, interleaved over cycles, with parity
checks of both arms.

Usage: timeout 1700 python experiments/exp23_rl_dec_ab.py
"""

import functools
import json
import os
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
from fl_rl_compression_mpi_tpu.ops import lanes, rl_pallas
from fl_rl_compression_mpi_tpu.ops.lanes import (
    LANES, flat_idx)
from fl_rl_compression_mpi_tpu.ops.rl_pallas import (
    rl_encode_pallas, rl_split_packed, rl_decode_pallas)

_enable_compile_cache()
RESULTS = {}
SMOKE = bool(int(os.environ.get("FLRL_EXP23_SMOKE", "0")))
N = (1 << 21) if SMOKE else (64 << 20)
ROWS = N // LANES
CYCLES = 1 if SMOKE else 3
_I32MAX = 2 ** 31 - 1
_iota = lambda s, d: jax.lax.broadcasted_iota(jnp.int32, s, d)


def _interpret():
    return jax.default_backend() != "tpu"


# ------------------------- vendored OLD decode kernel (pre-round-redux)
def _decode_kernel_old(R: int, sub: int, win: int):
    HEAD = 8 * LANES
    SW = sub + 8
    E_ROWS = SW + 8
    nbits = (sub * LANES + HEAD - 1).bit_length()

    def kernel(starts_hbm, vals_hbm, out_ref, carry, starts_w, vals_w,
               sem0, sem1):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry[0] = 0
            carry[1] = 0

        j0 = carry[0]
        nrows = starts_hbm.shape[0]
        arow = jnp.clip((j0 // LANES) & ~7, 0, nrows - win)
        cp0 = pltpu.make_async_copy(
            starts_hbm.at[pl.ds(arow, win)], starts_w, sem0)
        cp1 = pltpu.make_async_copy(
            vals_hbm.at[pl.ds(arow, win)], vals_w, sem1)
        cp0.start()
        cp1.start()
        cp0.wait()
        cp1.wait()

        def to_view(x, fill):
            if win >= SW:
                return x[:SW]
            return jnp.concatenate(
                [x, jnp.full((SW - win, LANES), fill, jnp.int32)], axis=0)

        base = i * R * LANES
        st = starts_w[...]
        vl = vals_w[...] & jnp.int32(0xFF)
        q = flat_idx(SW)
        fidx = flat_idx(E_ROWS)
        seed = carry[1]
        outs = []
        for h in range(R // sub):
            bh = base + h * sub * LANES
            if h == 0:
                sth, vlh = to_view(st, _I32MAX), to_view(vl, 0)
            else:
                cnt = jnp.sum((st <= bh - 1).astype(jnp.int32))
                mh = jnp.maximum(cnt - 1, 0)
                sth = to_view(
                    lanes.flat_shift_down_dyn(st, mh, _I32MAX), _I32MAX)
                vlh = to_view(lanes.flat_shift_down_dyn(vl, mh, 0), 0)
            t = sth - bh
            live = (t >= 0) & (t < sub * LANES)
            w = lanes.pack_route(live, t + HEAD - q, vlh)
            wpad = jnp.concatenate(
                [w, jnp.zeros((8, LANES), jnp.int32)], axis=0)
            we = lanes.expand_msb(wpad, nbits)
            fv = jnp.where(we < 0,
                           ((fidx + 1) << 9) | jnp.int32(1 << 8)
                           | (we & jnp.int32(0xFF)),
                           jnp.int32(0))
            fv = jnp.where(fidx == 0, (1 << 8) | seed, fv)
            filled = lanes.prefix_max_flat(fv)
            outs.append((filled[8:sub + 8] & jnp.int32(0xFF))
                        .astype(jnp.uint8))
            seed = filled[sub + 7, LANES - 1] & jnp.int32(0xFF)
        out_ref[...] = outs[0] if len(outs) == 1 else jnp.concatenate(
            outs, axis=0)
        cntlt = jnp.sum((st <= base + R * LANES - 1).astype(jnp.int32))
        carry[0] = arow * LANES + jnp.maximum(cntlt - 1, 0)
        carry[1] = seed
    return kernel


@functools.partial(jax.jit, static_argnames=("rows_out",))
def rl_decode_old(counts, values, num_runs, rows_out):
    R = rl_pallas.DEC_TILE_ROWS
    sub = min(R, rl_pallas.DEC_SUB_ROWS)
    win = R + 8
    grid = rows_out // R
    rcap = counts.shape[0]
    c32 = counts.astype(jnp.int32)
    starts = jnp.cumsum(c32) - c32
    idx = jnp.arange(rcap, dtype=jnp.int32)
    starts = jnp.where(idx < num_runs, starts, _I32MAX)
    pad_rows = rcap // LANES + R + 16
    st2 = jnp.full((pad_rows, LANES), _I32MAX, jnp.int32)
    st2 = jax.lax.dynamic_update_slice(
        st2.reshape(-1), starts, (0,)).reshape(pad_rows, LANES)
    vl2 = jnp.zeros((pad_rows, LANES), jnp.int32)
    vl2 = jax.lax.dynamic_update_slice(
        vl2.reshape(-1), values.astype(jnp.int32), (0,)
    ).reshape(pad_rows, LANES)
    return pl.pallas_call(
        _decode_kernel_old(R, sub, win),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((R, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_out, LANES), jnp.uint8),
        scratch_shapes=[
            pltpu.SMEM((2,), jnp.int32),
            pltpu.VMEM((win, LANES), jnp.int32),
            pltpu.VMEM((win, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(st2, vl2)


# ------------------------------------------------------------- harness
def make_pair_chain(dec):
    nn = jnp.int32(N)

    def pair(x2d):
        packed, total = rl_encode_pallas(x2d, nn)
        counts, values = rl_split_packed(packed)
        return dec(counts, values, total, ROWS)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(x, k):
        return jax.lax.fori_loop(0, k, lambda _, v: pair(v), x)
    return chain


def time_chain(chain, x, inner, reps=3):
    jax.device_get(chain(x, 1).ravel()[-1])
    jax.device_get(chain(x, 1 + inner).ravel()[-1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(chain(x, 1).ravel()[-1])
        t1 = time.perf_counter()
        jax.device_get(chain(x, 1 + inner).ravel()[-1])
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / inner)
    return max(float(np.median(ts)), 1e-9)


def main():
    rng = np.random.default_rng(0)
    nl = N // 32
    long_runs = np.repeat(rng.integers(0, 256, nl, np.uint8),
                          rng.integers(16, 112, nl))[:N].copy()
    ns = N // 4
    short_runs = np.repeat(rng.integers(0, 256, ns, np.uint8),
                           rng.integers(2, 14, ns))[:N].copy()
    assert long_runs.size == N and short_runs.size == N

    data = {
        "long": jax.device_put(
            jnp.asarray(long_runs.reshape(ROWS, LANES))),
        "short": jax.device_put(
            jnp.asarray(short_runs.reshape(ROWS, LANES))),
    }

    # parity: both arms decode the same stream back to the input
    nn = jnp.int32(N)
    for name, x in data.items():
        packed, total = rl_encode_pallas(x, nn)
        counts, values = rl_split_packed(packed)
        o_new = rl_decode_pallas(counts, values, total, ROWS)
        o_old = rl_decode_old(counts, values, total, ROWS)
        ref = (long_runs if name == "long" else short_runs)
        ok_new = bool(np.array_equal(
            np.asarray(jax.device_get(o_new)).reshape(-1), ref))
        ok_old = bool(np.array_equal(
            np.asarray(jax.device_get(o_old)).reshape(-1), ref))
        RESULTS[f"parity_new_{name}"] = ok_new
        RESULTS[f"parity_old_{name}"] = ok_old
        print(f"parity {name}: new={ok_new} old={ok_old}", flush=True)
        if not (ok_new and ok_old):
            return

    chains = {
        "pair_old": make_pair_chain(
            lambda c, v, t, r: rl_decode_old(c, v, t, r)),
        "pair_new": make_pair_chain(
            lambda c, v, t, r: rl_decode_pallas(c, v, t, r)),
    }
    inner = 1 if SMOKE else 8
    for cyc in range(CYCLES):
        for name, chain in chains.items():
            for dn, x in data.items():
                try:
                    t = time_chain(chain, x, inner,
                                   reps=(3 if cyc == 0 else 1))
                except Exception:
                    print(f"{name}/{dn}: FAILED "
                          f"{traceback.format_exc()[-300:]}", flush=True)
                    continue
                r = (2 * N) / 1e9 / t
                RESULTS.setdefault(f"{name}_{dn}", []).append(round(r, 2))
                print(f"cycle {cyc} {name}/{dn}: {r:.2f} GB/s "
                      f"(credited pair)", flush=True)

    print(json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception:
        print(f"MAIN FAILED\n{traceback.format_exc()[-1200:]}", flush=True)
        print(json.dumps(RESULTS), flush=True)
