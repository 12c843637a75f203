"""Pallas TPU kernels for the RL (run-length) codec.

The reference never shipped RL code — only the scatter-compaction spec in
``/root/reference/IMPLEMENTATION-PLAN.md:81-179``.  XLA lowers that
formulation's gathers/scatters to the TPU scalar core (~0.05-0.1 GB/s
measured in round 1 — experiments/FINDINGS.md); these kernels re-express
it with the monotone routing networks of ``lanes.py``:

Encode (one sequential-grid pass over (TILE_ROWS,128)-byte tiles):
  flag run starts (shift-compare with a cross-tile carry byte) → global
  run-start prefix-max (carry) → 255-cap piece flags → per-piece counts
  via an exclusive suffix-min of boundary indices over a 32-row lookahead
  window (the cap bounds every count at 255 < 4096 lookahead bytes) →
  pack (value|count) and LSB-compact the piece starts → prepend the
  cross-tile partial output row → one dynamic-offset DMA per tile.
  Output: packed i32 stream (count<<8 | value) + total piece count; the
  XLA wrapper splits counts/values (elementwise).

The piece rule (natural starts + a boundary every 255 bytes within a run)
is identical to `rl_numpy.encode` / the native C++ host codec, so the
container bytes match bit-for-bit.

Decode lives in :func:`rl_decode_pallas` below: run windows are DMA'd
at a run cursor, expanded to their start positions with the MSB network,
and holes are filled with a prefix-max carry fill.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import lanes
from .lanes import LANES, flat_idx, flat_shift_down, flat_shift_up

# Encode tiles cap at 256 rows (2^15 elements — the routing word's dist
# field); decode at 128 (its +128-slot headroom costs one more bit).
# Bigger is better on chip: per-tile DMA latency dominates (exp9:
# 2.6 / 4.9 / 8.1 GB/s at 64 / 128 / 256 encode rows).
TILE_ROWS = int(os.environ.get("FLRL_RL_TILE_ROWS", "256"))
DEC_TILE_ROWS = int(os.environ.get("FLRL_RL_DEC_TILE_ROWS", "128"))
LOOK_ROWS = 32            # 4096-byte lookahead ≥ the 255-byte run cap
_I32MAX = 2 ** 31 - 1


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _encode_kernel(R: int, nbits: int, grid: int):
    E = R + LOOK_ROWS

    def kernel(n_ref, xm_ref, xl_ref, out_ref, total_ref,
               carry, carry_row, merged, sem):
        i = pl.program_id(0)
        n = n_ref[0]

        @pl.when(i == 0)
        def _():
            carry[0] = -1          # previous byte (sentinel ≠ any byte)
            carry[1] = 0           # run-start index carry
            carry[2] = 0           # emitted-piece cursor
            carry_row[...] = jnp.zeros((1, LANES), jnp.int32)

        xm = xm_ref[...].astype(jnp.int32)
        xl = xl_ref[...].astype(jnp.int32)
        xe = jnp.concatenate([xm, xl], axis=0)          # (E, 128)
        base = i * R * LANES
        fidx = flat_idx(E)
        gidx = base + fidx

        # run-start flags (value change, stream head, or the n boundary)
        prev = flat_shift_up(xe, 1, 0)
        prev = jnp.where(fidx == 0, carry[0], prev)
        s = (xe != prev) | (gidx == n)

        # natural run start of each position (global prefix-max + carry)
        ls = lanes.prefix_max_flat(jnp.where(s, gidx, -1))
        ls = jnp.maximum(ls, carry[1])

        # 255-cap piece boundaries (IMPLEMENTATION-PLAN.md:125 semantics:
        # a boundary every 255 bytes after the natural start)
        d = gidx - ls
        pflag = s | (d % 255 == 0)

        # count = next boundary − this boundary (exclusive suffix-min of
        # flagged indices; the cap guarantees it lies inside the
        # lookahead; clamp with n for the final run)
        nxt = flat_shift_down(
            lanes.suffix_min_flat(jnp.where(pflag, gidx, _I32MAX)),
            1, _I32MAX)
        nxt = jnp.minimum(nxt, n)
        cnt = nxt - gidx

        keep = pflag & (gidx < n) & (_iota((E, LANES), 0) < R)
        psum = lanes.prefix_sum_flat(keep.astype(jnp.int32))
        dist = fidx - (psum - 1)
        K = jnp.max(psum)

        payload16 = (xe & jnp.int32(0xFF)) | ((cnt & jnp.int32(0xFF)) << 8)
        w = lanes.pack_route(keep, dist, payload16)
        wc = lanes.compact_lsb(w[:R], nbits) & jnp.int32(0xFFFF)

        # prepend the cross-tile partial output row, stage, and emit.
        # The PREVIOUS tile's DMA is only awaited here — it overlaps this
        # tile's whole compute phase — and because the next DMA starts
        # strictly after the previous completed, the overlapping output
        # regions (junk tails overwritten by the next tile's live data)
        # land in order.
        cc = carry[2] % LANES
        out_row = carry[2] // LANES
        padded = jnp.concatenate(
            [wc, jnp.zeros((8, LANES), jnp.int32)], axis=0)
        sh = flat_shift_up(padded, cc, 0)
        sh = jnp.where((_iota((R + 8, LANES), 0) == 0)
                       & (_iota((R + 8, LANES), 1) < cc),
                       carry_row[...], sh)
        dst = out_ref.at[pl.ds(out_row, R + 8)]

        @pl.when(i > 0)
        def _():
            pltpu.make_async_copy(merged, dst, sem).wait()
        merged[...] = sh
        cp = pltpu.make_async_copy(merged, dst, sem)
        cp.start()

        @pl.when(i == grid - 1)
        def _():
            pltpu.make_async_copy(merged, dst, sem).wait()

        # carries for the next tile: extract row p of the register value
        # via a masked reduction (lax.dynamic_slice has no Pallas TPU
        # lowering; reading the in-flight DMA buffer would race)
        p = (cc + K) // LANES
        carry_row[...] = jnp.sum(
            jnp.where(_iota((R + 8, LANES), 0) == p, sh, 0),
            axis=0, keepdims=True)
        carry[2] = carry[2] + K
        carry[0] = xm[R - 1, LANES - 1]
        carry[1] = ls[R - 1, LANES - 1]
        total_ref[0] = carry[2]
    return kernel


@functools.partial(jax.jit, static_argnames=("tile_rows",))
def rl_encode_pallas(x2d: jax.Array, n: jax.Array,
                     tile_rows: int | None = None):
    """RL encode on device.  ``x2d``: u8[(rows,128)], rows a tile multiple,
    bytes beyond ``n`` zero (standard zero-pad contract — the ``n``
    boundary cut makes pad content irrelevant anyway).

    Returns ``(packed i32[(rows + tile + 8)·128], total i32[])`` where
    ``packed[j] = count<<8 | value`` for piece ``j < total``.
    """
    R = TILE_ROWS if tile_rows is None else tile_rows
    assert R % LOOK_ROWS == 0
    rows = x2d.shape[0]
    assert x2d.shape[1] == LANES and rows % R == 0
    grid = rows // R
    nbits = (R * LANES - 1).bit_length()
    nblk = rows // LOOK_ROWS

    packed, total = pl.pallas_call(
        _encode_kernel(R, nbits, grid),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((R, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (LOOK_ROWS, LANES),
                lambda i: (jnp.minimum((i + 1) * (R // LOOK_ROWS),
                                       nblk - 1), 0),
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
        interpret=_interpret(),
    )(jnp.asarray(n, jnp.int32).reshape(1), x2d, x2d)
    return packed.reshape(-1), total[0]


def rl_split_packed(packed: jax.Array):
    """packed i32 → (counts u8, values u8) (elementwise, jit-fused)."""
    return (((packed >> 8) & 0xFF).astype(jnp.uint8),
            (packed & 0xFF).astype(jnp.uint8))


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

def _decode_kernel(R: int):
    """Output tiles of (R,128) bytes; a run-cursor window of (R+8)·128 runs
    is DMA'd per tile from an 8-row-ALIGNED offset (unaligned dynamic-row
    HBM reads faulted the chip in exp8/exp9; every run ≥ 1 byte, so the
    window still covers the tile after ≤1023 slots of alignment slack),
    expanded to start positions with the MSB network (+1024-slot headroom
    keeps distances positive under that slack), then holes take the
    previous run's value via a packed prefix-max fill."""
    W_ROWS = R + 8
    HEAD = 8 * LANES          # 1024-slot headroom
    E_ROWS = W_ROWS + 8       # expansion workspace rows
    nbits = (R * LANES + HEAD - 1).bit_length()

    def kernel(starts_hbm, vals_hbm, out_ref, carry, starts_w, vals_w,
               sem0, sem1):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry[0] = 0           # run cursor (absolute run index)
            carry[1] = 0           # value of the run straddling tile start

        j0 = carry[0]
        nrows = starts_hbm.shape[0]
        arow = jnp.clip((j0 // LANES) & ~7, 0, nrows - W_ROWS)
        cp0 = pltpu.make_async_copy(
            starts_hbm.at[pl.ds(arow, W_ROWS)], starts_w, sem0)
        cp0.start()
        cp0.wait()
        cp1 = pltpu.make_async_copy(
            vals_hbm.at[pl.ds(arow, W_ROWS)], vals_w, sem1)
        cp1.start()
        cp1.wait()

        base = i * R * LANES
        st = starts_w[...]
        t = st - base
        live = (t >= 0) & (t < R * LANES)
        q = flat_idx(W_ROWS)
        dist = t + HEAD - q       # headroom keeps live distances > 0
        w = lanes.pack_route(live, dist, vals_w[...] & jnp.int32(0xFF))
        wpad = jnp.concatenate([w, jnp.zeros((8, LANES), jnp.int32)],
                               axis=0)
        we = lanes.expand_msb(wpad, nbits)

        # hole fill: later run starts win (index-dominant packing); the
        # headroom slot 0 seeds the straddling run's carried value
        fidx = flat_idx(E_ROWS)
        fv = jnp.where(we < 0,
                       ((fidx + 1) << 9) | jnp.int32(1 << 8)
                       | (we & jnp.int32(0xFF)),
                       jnp.int32(0))
        fv = jnp.where(fidx == 0, (1 << 8) | carry[1], fv)
        filled = lanes.prefix_max_flat(fv)
        out_ref[...] = (filled[8:R + 8] & jnp.int32(0xFF)).astype(jnp.uint8)

        # cursor: absolute index of the run containing the tile's last byte
        cntlt = jnp.sum((st <= base + R * LANES - 1).astype(jnp.int32))
        carry[0] = arow * LANES + jnp.maximum(cntlt - 1, 0)
        carry[1] = filled[R + 7, LANES - 1] & jnp.int32(0xFF)
    return kernel


@functools.partial(jax.jit, static_argnames=("tile_rows", "rows_out"))
def rl_decode_pallas(counts: jax.Array, values: jax.Array, num_runs,
                     rows_out: int, tile_rows: int | None = None):
    """RL decode on device.  ``counts``/``values``: u8[Rcap] (validity
    bounded by traced ``num_runs``); returns u8[(rows_out,128)] — callers
    slice the flat view ``[:n]``.
    """
    R = DEC_TILE_ROWS if tile_rows is None else tile_rows
    assert rows_out % R == 0
    grid = rows_out // R
    rcap = counts.shape[0]

    # exclusive prefix of counts = run start offsets; dead slots pushed to
    # +inf so they never land in a tile
    c32 = counts.astype(jnp.int32)
    starts = jnp.cumsum(c32) - c32
    idx = jnp.arange(rcap, dtype=jnp.int32)
    starts = jnp.where(idx < num_runs, starts, _I32MAX)

    # pad to whole window rows (the cursor DMA may read R+8 rows past the
    # last live run)
    pad_rows = rcap // LANES + R + 16
    st2 = jnp.full((pad_rows, LANES), _I32MAX, jnp.int32)
    st2 = jax.lax.dynamic_update_slice(
        st2.reshape(-1), starts, (0,)).reshape(pad_rows, LANES)
    vl2 = jnp.zeros((pad_rows, LANES), jnp.int32)
    vl2 = jax.lax.dynamic_update_slice(
        vl2.reshape(-1), values.astype(jnp.int32), (0,)
    ).reshape(pad_rows, LANES)

    out = pl.pallas_call(
        _decode_kernel(R),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((R, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_out, LANES), jnp.uint8),
        scratch_shapes=[
            pltpu.SMEM((2,), jnp.int32),
            pltpu.VMEM((R + 8, LANES), jnp.int32),
            pltpu.VMEM((R + 8, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(st2, vl2)
    return out
