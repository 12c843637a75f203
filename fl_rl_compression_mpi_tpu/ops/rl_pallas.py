"""Pallas TPU kernels for the RL (run-length) codec.

The reference never shipped RL code — only the scatter-compaction spec in
``/root/reference/IMPLEMENTATION-PLAN.md:81-179``.  XLA lowers that
formulation's gathers/scatters to the TPU scalar core (~0.05-0.1 GB/s
measured in round 1 — experiments/FINDINGS.md); these kernels re-express
it with the monotone routing networks of ``lanes.py``:

Encode (one sequential-grid pass over (TILE_ROWS,128)-byte tiles):
  flag run starts (shift-compare with a cross-tile carry byte) → global
  run-start prefix-max carrying the (gidx mod 255) residue → 255-cap
  piece flags → pack (value | start&0xFF) and LSB-compact the piece
  starts → prepend the cross-tile partial output row → one
  dynamic-offset DMA per tile.  Counts are NOT computed in-kernel:
  consecutive piece starts differ by at most 255 (the cap), so the
  consumers difference start-mod-256 on the compacted stream — exact,
  and it deletes the per-byte bounded suffix-min and the lookahead
  window that dominated the round count (exp27/exp30: pair 7.8-8.0 vs
  6.4-7.3 GB/s, every interleaved cycle).
  Output: packed i32 stream ((start & 0xFF) << 8 | value) + total piece
  count; :func:`rl_split_packed` derives (counts, values).

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
from .lanes import LANES, flat_idx, flat_shift_up

# Routing networks cap at 2^15 elements per SUB-tile (the routing word's
# dist field: 256 rows for compaction, 128 for expansion with its
# 1024-slot headroom).  Tiles may span several sub-tiles — each is routed
# independently at 15 bits and merged with one dynamic flat shift
# (lanes.flat_shift_up_dyn) — but same-session A/B (exp13) measured
# multi-sub tiles SLOWER (encode 6.1/4.9/4.5 GB/s at 256/512/1024 rows;
# decode 8.0/6.5/5.0 at 128/256/512): per-tile DMA traffic scales with
# the worst-case tile (full merged-buffer emit, full run window), so
# growing R grows bytes moved, not just amortization.  Defaults stay at
# one sub-tile per tile.
TILE_ROWS = int(os.environ.get("FLRL_RL_TILE_ROWS", "256"))
SUB_ROWS = 256
DEC_TILE_ROWS = int(os.environ.get("FLRL_RL_DEC_TILE_ROWS", "128"))
DEC_SUB_ROWS = 128
# Adaptive single-sub WIDE tiles (round 4, chip A/B exp49: the slow
# paths are a wash — long-run pair 7.33-7.38 -> 7.40-7.42, short-run
# 3.55 -> 3.57 — while CONSTANT regions gain ~2x, zeros 37-41 -> 72-88
# GB/s: the closed-form fast paths amortize per-tile fixed cost over 4-8x
# bigger tiles, and the wide two-array networks remove the per-sub merge
# ladders that made big tiles lose in exp13).
WIDE_ROWS = int(os.environ.get("FLRL_RL_WIDE_ROWS", "1024"))
# Encode-side goes wider still (round 5, chip A/B exp56, 3 cycles):
# R=2048 single-sub encode pairs 7.46 -> 8.42 GB/s on run-structured
# streams (+13%) and 78 -> 82 on zeros, a wash (-1.6%) on the
# half-constant mix.  Decode stays at WIDE_ROWS (its window DMA grows
# with the tile; unmeasured at 2048).
ENC_WIDE_ROWS = int(os.environ.get("FLRL_RL_ENC_WIDE_ROWS", "2048"))


def encode_tile_rows(rows: int) -> int:
    """Adaptive encode tile: the widest single-sub tile the buffer
    divides (see WIDE_ROWS/ENC_WIDE_ROWS notes), else the r3 default."""
    for w in (ENC_WIDE_ROWS, WIDE_ROWS):
        if w and rows % w == 0:
            return w
    return TILE_ROWS


def decode_tile_rows(rows_out: int) -> int:
    """Adaptive decode tile (must match the ``tile_rows`` used to compute
    any :func:`decode_window_rows` hint — a hint for a smaller tile can
    under-cover a bigger tile's run span)."""
    return (WIDE_ROWS if WIDE_ROWS and rows_out % WIDE_ROWS == 0
            else DEC_TILE_ROWS)
_I32MAX = 2 ** 31 - 1


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _EMIT_BUCKETS(R: int):
    """Static emit-DMA row sizes for an R-row encode tile (smallest
    covering bucket is selected per tile at runtime)."""
    out = []
    b = 8
    while b < R + 8:
        out.append(b)
        b *= 4
    return out + [R + 8]


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _mod255(x):
    """x mod 255 for x >= 0 via byte folds (256 ≡ 1 mod 255) — the VPU
    has no fast integer division."""
    s = ((x & 255) + ((x >> 8) & 255) + ((x >> 16) & 255)
         + ((x >> 24) & 255))
    s = (s & 255) + (s >> 8)
    s = (s & 255) + (s >> 8)
    return jnp.where(s >= 255, s - 255, s)


def _encode_kernel(R: int, sub: int, grid: int):
    nbits = (sub * LANES - 1).bit_length()

    def kernel(n_ref, xm_ref, out_ref, total_ref,
               carry, carry_row, merged, sem):
        i = pl.program_id(0)
        n = n_ref[0]

        @pl.when(i == 0)
        def _():
            carry[0] = -1          # previous byte (sentinel ≠ any byte)
            carry[1] = 0           # (gidx mod 255) of the last run start
            carry[2] = 0           # emitted-piece cursor
            carry_row[...] = jnp.zeros((1, LANES), jnp.int32)

        xm = xm_ref[...].astype(jnp.int32)
        base = i * R * LANES
        fidx = flat_idx(R)
        gidx = base + fidx

        # run-start flags (value change or stream head)
        prev = flat_shift_up(xm, 1, 0)
        prev = jnp.where(fidx == 0, carry[0], prev)
        s = xm != prev
        gmod = _mod255(gidx)
        # CONSTANT-TILE fast path: a tile with no run start (long zero/
        # constant regions dominate real files) has a closed-form piece
        # stream — kept positions are exactly gidx ≡ carry-residue
        # (mod 255), value is the carried byte, and start_j & 0xFF =
        # (first − j) & 0xFF since 255 ≡ −1 (mod 256) — so the whole
        # 50-round scan/route pipeline (the measured latency floor,
        # FINDINGS.md exp33) is branch-skipped.  At i == 0 the −1
        # sentinel in carry[0] forces s[0] and the slow path.
        has_start = jnp.any(s)

        cc = carry[2] % LANES
        out_row = carry[2] // LANES
        sh0 = jnp.where((_iota((R + 8, LANES), 0) == 0)
                        & (_iota((R + 8, LANES), 1) < cc),
                        carry_row[...], jnp.int32(0))
        # The previous tile's DMA is awaited before either branch writes
        # ``merged`` — it overlapped this tile's flag compute; the wait
        # branches on the bucket the PREVIOUS tile actually started so
        # semaphore byte counts match.
        @pl.when(i > 0)
        def _():
            for bi, Bk in enumerate(_EMIT_BUCKETS(R)):
                @pl.when(carry[3] == bi)
                def _(Bk=Bk):
                    pltpu.make_async_copy(
                        merged.at[:Bk], out_ref.at[pl.ds(out_row, Bk)],
                        sem).wait()

        @pl.when(has_start)
        def _():
            # (gidx mod 255) of each position's run start: the tile-local
            # fidx (< 2^15) rides the high bits of the prefix-max key for
            # monotonicity and the residue comes along for free
            key = jnp.where(s, (fidx << 8) | gmod, -1)
            r = lanes.prefix_max_flat(key)
            lsmod = jnp.where(r >= 0, r & 255, carry[1])

            # 255-cap piece boundaries (IMPLEMENTATION-PLAN.md:125
            # semantics: a boundary every 255 bytes after the natural
            # start) — gmod == lsmod ⟺ (gidx − run start) ≡ 0 (mod 255),
            # both residues < 255
            pflag = s | (gmod == lsmod)
            keep = pflag & (gidx < n)
            psum = lanes.prefix_sum_flat(keep.astype(jnp.int32))

            payload16 = (xm & jnp.int32(0xFF)) | ((gidx & jnp.int32(0xFF))
                                                  << 8)

            # Per-sub-tile compaction (dist field caps a network at 2^15
            # elements): each sub-tile's pieces compact to its own front
            # with a 15-bit network, then one dynamic flat shift places
            # them at the running output cursor ``cc + K(<h)``.
            # Distances stay monotone within a sub-tile, so
            # collision-freedom is preserved.
            sub_idx = flat_idx(sub)
            sh = sh0
            kprev = jnp.int32(0)      # pieces emitted by earlier sub-tiles
            for h in range(R // sub):
                lo = h * sub
                keep_h = keep[lo:lo + sub]
                psum_h = psum[lo:lo + sub]
                dist_h = sub_idx - (psum_h - kprev - 1)
                if sub * LANES <= (1 << 15):
                    w = lanes.pack_route(keep_h, dist_h,
                                         payload16[lo:lo + sub])
                    wc = lanes.compact_lsb(w, nbits) & jnp.int32(0xFFFF)
                else:
                    # WIDE two-array compaction (round 4): dist rides the
                    # ctrl word's bits 0..30, the piece payload a second
                    # array — no 2^15 cap, so one R=1024 sub-tile
                    # replaces 4 sub-tiles + their dynamic merge shifts
                    ctrl = lanes.pack_route_wide(keep_h, dist_h)
                    ctrl, payc = lanes.compact_lsb2_wide(
                        ctrl, payload16[lo:lo + sub], nbits)
                    wc = jnp.where(ctrl < 0, payc & jnp.int32(0xFFFF),
                                   jnp.int32(0))
                part = jnp.concatenate(
                    [wc, jnp.zeros((R + 8 - sub, LANES), jnp.int32)],
                    axis=0)
                if h == 0:
                    # first sub-tile: the merge offset is just cc < 128,
                    # so the dyn shift's row ladder is statically dead —
                    # lane ladder only (7 rounds instead of 15+)
                    sh = sh | lanes.flat_shift_up_dyn_lane(part, cc, 0)
                else:
                    sh = sh | lanes.flat_shift_up_dyn(part, cc + kprev, 0)
                kprev = jnp.max(psum_h)   # = K(<h+1); psum is monotone
            K = kprev
            merged[...] = sh
            p = (cc + K) // LANES
            carry_row[...] = jnp.sum(
                jnp.where(_iota((R + 8, LANES), 0) == p, sh, 0),
                axis=0, keepdims=True)
            carry[1] = lsmod[R - 1, LANES - 1]
            carry[4] = K

        @pl.when(jnp.logical_not(has_start))
        def _():
            # closed form: keeps are every 255th position from ``first``
            keep = (gmod == carry[1]) & (gidx < n)
            K = jnp.sum(keep.astype(jnp.int32))
            first = jnp.min(jnp.where(keep, gidx, jnp.int32(_I32MAX)))
            slot = flat_idx(R + 8)
            j = slot - cc
            word = (((first - j) & jnp.int32(0xFF)) << 8) \
                | (carry[0] & jnp.int32(0xFF))
            sh = sh0 | jnp.where((slot >= cc) & (slot < cc + K),
                                 word, jnp.int32(0))
            merged[...] = sh
            p = (cc + K) // LANES
            carry_row[...] = jnp.sum(
                jnp.where(_iota((R + 8, LANES), 0) == p, sh, 0),
                axis=0, keepdims=True)
            carry[4] = K

        K = carry[4]

        # BUCKETED emit: only ceil((cc+K)/128) rows of the merged buffer
        # hold live pieces — for compressible streams that is a few rows,
        # not R+8 — so the emit DMA copies the smallest static bucket
        # that covers them (exp13 showed full-buffer emits make write
        # traffic scale with the worst-case tile: 4× the input bytes).
        # Junk beyond cc+K inside the last emitted row is overwritten by
        # the next tile's emit (which starts at that row); because the
        # next DMA starts strictly after the previous completed (wait
        # above), the overlapping rows land in order.
        rows_used = jnp.maximum((cc + K + LANES - 1) // LANES, 1)
        bid = jnp.int32(0)
        for Bk in _EMIT_BUCKETS(R)[:-1]:
            bid = bid + (rows_used > Bk).astype(jnp.int32)

        for bi, Bk in enumerate(_EMIT_BUCKETS(R)):
            @pl.when(bid == bi)
            def _(Bk=Bk):
                pltpu.make_async_copy(
                    merged.at[:Bk], out_ref.at[pl.ds(out_row, Bk)],
                    sem).start()
        carry[3] = bid

        @pl.when(i == grid - 1)
        def _():
            for bi, Bk in enumerate(_EMIT_BUCKETS(R)):
                @pl.when(bid == bi)
                def _(Bk=Bk):
                    pltpu.make_async_copy(
                        merged.at[:Bk], out_ref.at[pl.ds(out_row, Bk)],
                        sem).wait()

        carry[2] = carry[2] + K
        carry[0] = xm[R - 1, LANES - 1]
        total_ref[0] = carry[2]
    return kernel


@functools.partial(jax.jit, static_argnames=("tile_rows", "sub_rows"))
def rl_encode_pallas(x2d: jax.Array, n: jax.Array,
                     tile_rows: int | None = None,
                     sub_rows: int | None = None):
    """RL encode on device.  ``x2d``: u8[(rows,128)], rows a tile multiple,
    bytes beyond ``n`` zero (standard zero-pad contract — the ``n``
    boundary cut makes pad content irrelevant anyway).

    Returns ``(packed i32[(rows + tile + 8)·128], total i32[])`` where
    ``packed[j] = (start_j & 0xFF) << 8 | value_j`` for piece ``j <
    total``.  Piece counts follow from mod-256 start differences
    (consecutive starts are ≤ 255 apart by the cap) — see
    :func:`rl_split_packed`.
    """
    R = TILE_ROWS if tile_rows is None else tile_rows
    sub = min(R, SUB_ROWS if sub_rows is None else sub_rows)
    assert R % sub == 0
    # sub-tiles past 2^15 elements take the WIDE two-array network (the
    # 15-bit dist cap applies only to the packed one-array layout)
    assert sub * LANES <= 1 << 30
    rows = x2d.shape[0]
    assert x2d.shape[1] == LANES and rows % R == 0
    grid = rows // R

    packed, total = pl.pallas_call(
        _encode_kernel(R, sub, grid),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((R, LANES), lambda i: (i, 0),
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
            pltpu.SMEM((5,), jnp.int32),
            pltpu.VMEM((1, LANES), jnp.int32),
            pltpu.VMEM((R + 8, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(jnp.asarray(n, jnp.int32).reshape(1), x2d)
    return packed.reshape(-1), total[0]


def rl_split_packed(packed: jax.Array, total: jax.Array, n: jax.Array):
    """packed starts-stream i32 → (counts u8, values u8) (elementwise,
    jit-fused).  ``counts[j] = (start_{j+1} − start_j) mod 256`` — exact
    because the 255 cap bounds every gap — with the final live piece
    closed by ``n``; entries beyond ``total`` are junk, as before."""
    s8 = (packed >> 8) & 0xFF
    nxt = jnp.concatenate([s8[1:], s8[:1]])
    idx = jnp.arange(packed.shape[0], dtype=jnp.int32)
    nxt = jnp.where(idx == jnp.asarray(total, jnp.int32) - 1,
                    jnp.asarray(n, jnp.int32) & 0xFF, nxt)
    return (((nxt - s8) & 0xFF).astype(jnp.uint8),
            (packed & 0xFF).astype(jnp.uint8))


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

def decode_window_rows(counts: np.ndarray, rows_out: int,
                       tile_rows: int | None = None) -> int:
    """Static window-row hint for :func:`rl_decode_pallas`: the smallest
    bucket covering the densest tile's run span plus the 8-row DMA
    alignment slack.  The default worst-case window (R+8 rows — every
    output byte its own run) makes the window DMA read ~8 i32 bytes per
    decoded byte; real streams need a fraction of that, and the hint is
    exact, so callers holding host counts (CLI, bench) shrink the read
    traffic by up to 16×.  Buckets (16, 24, 40, 72, 136, …) bound the
    number of compiled variants."""
    R = DEC_TILE_ROWS if tile_rows is None else tile_rows
    c = np.asarray(counts).astype(np.int64)
    if c.size == 0:
        return 16
    starts = np.cumsum(c) - c
    grid = max(1, rows_out // R)
    bases = np.arange(grid + 1, dtype=np.int64) * (R * LANES)
    hi = np.searchsorted(starts, bases[1:], side="left")
    lo = np.maximum(np.searchsorted(starts, bases[:-1], side="right") - 1, 0)
    needed = int((hi - lo).max())
    win = (1023 + needed + LANES - 1) // LANES
    b = 16
    while b < min(win, R + 8):
        b = 8 + (b - 8) * 2
    return min(b, R + 8)


def _decode_kernel(R: int, sub: int, win: int, grid: int):
    """Output tiles of (R,128) bytes; ONE run-cursor window of ``win``·128
    runs per tile from an 8-row-ALIGNED offset (unaligned dynamic-row
    HBM reads faulted the chip in exp8/exp9).  ``win`` must cover the
    densest tile's run span + alignment slack — the R+8-row worst case
    (every output byte its own run) always does, and
    :func:`decode_window_rows` computes the exact bound from host counts.

    Two round-reduction measures (exp22, same-session A/B):

    * the window DMA is DOUBLE-BUFFERED: the next tile's cursor depends
      only on the current *window* (a compare-reduce), not on the
      expansion, so the next window's DMA is issued before this tile's
      expansion and overlaps it (the old start+wait at tile head
      serialized ~a DMA latency per ~1.6 µs tile);
    * the hole fill is a BOUNDED 256-span prefix-max (8 rounds vs the
      global scan's lane ladder + row doubling): the 255-byte piece cap
      keeps every hole within 255 slots of its run start, and the
      straddle seed moves to headroom slot HEAD−1 so the seeded case
      obeys the same bound.

    The tile is decoded in (sub,128)-byte halves — the expansion
    network's dist field caps one pass at 2^15 slots — by dynamically
    shifting the window down to each half's straddling run
    (lanes.flat_shift_down_dyn; in-VMEM, no alignment constraint), then
    expanding to start positions with the MSB network (+1024-slot
    headroom keeps distances positive under the DMA slack)."""
    HEAD = 8 * LANES          # 1024-slot headroom
    SW = sub + 8              # per-half window view rows
    E_ROWS = SW + 8           # expansion workspace rows
    nbits = (sub * LANES + HEAD - 1).bit_length()

    def kernel(starts_hbm, vals_hbm, out_ref, carry, st_a, vl_a,
               st_b, vl_b, sem0, sem1):
        i = pl.program_id(0)
        nrows = starts_hbm.shape[0]

        def dma_pair(arow, st_w, vl_w):
            return (pltpu.make_async_copy(
                        starts_hbm.at[pl.ds(arow, win)], st_w, sem0),
                    pltpu.make_async_copy(
                        vals_hbm.at[pl.ds(arow, win)], vl_w, sem1))

        @pl.when(i == 0)
        def _():
            carry[1] = 0           # value of the run straddling tile start
            carry[2] = 0           # row offset of the pending DMA
            c0, c1 = dma_pair(0, st_a, vl_a)   # cursor 0 → arow 0
            c0.start()
            c1.start()

        def body(st_w, vl_w, st_n, vl_n):
            arow = carry[2]
            c0, c1 = dma_pair(arow, st_w, vl_w)
            c0.wait()
            c1.wait()
            base = i * R * LANES
            st = st_w[...]
            vl = vl_w[...] & jnp.int32(0xFF)

            # next tile's cursor needs only this window: issue its DMA
            # now so it overlaps the expansion below.  The constant-tile
            # check (below) rides the SAME reduction — its mismatch
            # count is packed into bits ≥ 15 of the summand (both counts
            # ≤ win·128 < 2^15, so the i32 sum cannot overflow) — it
            # costs a few elementwise compares and no extra reduce (a
            # separate any() measured ~6% on dense streams, exp36).
            le_hi = st <= base + R * LANES - 1
            mism = le_hi & (st >= base) & (vl != carry[1])
            if win * LANES < (1 << 15):
                stot = jnp.sum(le_hi.astype(jnp.int32)
                               + (mism.astype(jnp.int32) << 15))
                cntlt = stot & jnp.int32((1 << 15) - 1)
                const_tile = (stot >> 15) == 0
            else:               # huge window: shifted sum would overflow
                cntlt = jnp.sum(le_hi.astype(jnp.int32))
                const_tile = jnp.logical_not(jnp.any(mism))
            j0n = arow * LANES + jnp.maximum(cntlt - 1, 0)
            arown = jnp.clip((j0n // LANES) & ~7, 0, nrows - win)
            carry[2] = arown

            @pl.when(i < grid - 1)
            def _():
                n0, n1 = dma_pair(arown, st_n, vl_n)
                n0.start()
                n1.start()

            # CONSTANT-TILE fast path: when every piece overlapping this
            # output tile carries the straddling seed's value (long zero/
            # constant regions — cap-split pieces of one run all share the
            # value), the output is just that value; the per-half
            # shift/expand/fill pipeline (the latency floor) is
            # branch-skipped.  A run starting exactly at the tile base
            # conservatively falls to the slow path (the stale seed
            # cannot match a *different* new value — values are compared,
            # not positions).
            @pl.when(const_tile)
            def _():
                out_ref[...] = jnp.full(
                    (R, LANES), carry[1].astype(jnp.uint8))

            @pl.when(jnp.logical_not(const_tile))
            def _():
                _slow(st, vl)

        def _slow(st, vl):
            base = i * R * LANES

            def to_view(x, fill):
                if win >= SW:
                    return x[:SW]
                return jnp.concatenate(
                    [x, jnp.full((SW - win, LANES), fill, jnp.int32)],
                    axis=0)

            q = flat_idx(SW)
            fidx = flat_idx(E_ROWS)
            seed = carry[1]
            outs = []
            for h in range(R // sub):
                bh = base + h * sub * LANES
                if h == 0:
                    sth, vlh = to_view(st, _I32MAX), to_view(vl, 0)
                else:
                    # slot of the run straddling byte bh-1 (window order)
                    cnt = jnp.sum((st <= bh - 1).astype(jnp.int32))
                    mh = jnp.maximum(cnt - 1, 0)
                    sth = to_view(
                        lanes.flat_shift_down_dyn(st, mh, _I32MAX),
                        _I32MAX)
                    vlh = to_view(lanes.flat_shift_down_dyn(vl, mh, 0), 0)
                t = sth - bh
                live = (t >= 0) & (t < sub * LANES)
                if sub * LANES + HEAD <= (1 << 15):
                    w = lanes.pack_route(live, t + HEAD - q, vlh)
                    wpad = jnp.concatenate(
                        [w, jnp.zeros((8, LANES), jnp.int32)], axis=0)
                    we = lanes.expand_msb(wpad, nbits)
                else:
                    # WIDE two-array expansion (round 4): lifts the
                    # 2^15-slot cap so one big sub-tile replaces the
                    # per-half dynamic window shifts
                    zpad = jnp.zeros((8, LANES), jnp.int32)
                    ctrl = jnp.concatenate(
                        [lanes.pack_route_wide(live, t + HEAD - q),
                         zpad], axis=0)
                    vpad = jnp.concatenate([vlh, zpad], axis=0)
                    ctrl, vle = lanes.expand_msb2_wide(ctrl, vpad, nbits)
                    we = jnp.where(ctrl < 0,
                                   jnp.int32(lanes.LIVE)
                                   | (vle & jnp.int32(0xFF)),
                                   jnp.int32(0))

                # hole fill: later run starts win (index-dominant
                # packing); headroom slot HEAD-1 seeds the straddling
                # run's value so every hole is ≤ 255 slots from its
                # source and the 256-span bounded scan suffices
                fv = jnp.where(we < 0,
                               ((fidx + 1) << 9) | jnp.int32(1 << 8)
                               | (we & jnp.int32(0xFF)),
                               jnp.int32(0))
                fv = jnp.where(fidx == HEAD - 1, (1 << 8) | seed, fv)
                filled = lanes.prefix_max_flat_bounded(fv, 256, 0)
                outs.append((filled[8:sub + 8] & jnp.int32(0xFF))
                            .astype(jnp.uint8))
                seed = filled[sub + 7, LANES - 1] & jnp.int32(0xFF)
            out_ref[...] = outs[0] if len(outs) == 1 else jnp.concatenate(
                outs, axis=0)
            carry[1] = seed

        @pl.when(i % 2 == 0)
        def _():
            body(st_a, vl_a, st_b, vl_b)

        @pl.when(i % 2 == 1)
        def _():
            body(st_b, vl_b, st_a, vl_a)
    return kernel


def _decode_impl(cv_of_cap, rcap: int, num_runs, rows_out: int,
                 tile_rows, sub_rows, win_rows):
    """Shared decode driver: bucketed prep + window-expansion kernel.

    ``cv_of_cap(cap)`` returns (counts i32[cap], values i32[cap]) for a
    static truncation ``cap`` — the two public wrappers bind it to
    separate u8 arrays or to the encoder's packed i32 stream.
    """
    R = DEC_TILE_ROWS if tile_rows is None else tile_rows
    sub = min(R, DEC_SUB_ROWS if sub_rows is None else sub_rows)
    win = R + 8 if win_rows is None else min(win_rows, R + 8)
    assert R % sub == 0
    assert win % 8 == 0 and 16 <= win <= R + 8
    # big sub-tiles take the WIDE two-array network (see _decode_kernel)
    assert sub * LANES + 8 * LANES <= 1 << 30
    assert rows_out % R == 0
    grid = rows_out // R
    num_runs = jnp.asarray(num_runs, jnp.int32)

    def run_bucket(cap: int):
        """Prep + kernel with the run arrays truncated to ``cap`` slots."""
        # exclusive prefix of counts = run start offsets; dead slots
        # pushed to +inf so they never land in a tile
        c32, v32 = cv_of_cap(cap)
        starts = jnp.cumsum(c32) - c32
        idx = jnp.arange(cap, dtype=jnp.int32)
        starts = jnp.where(idx < num_runs, starts, _I32MAX)

        # pad to whole window rows (the cursor DMA may read R+8 rows past
        # the last live run)
        pad_rows = cap // LANES + R + 16
        st2 = jnp.full((pad_rows, LANES), _I32MAX, jnp.int32)
        st2 = jax.lax.dynamic_update_slice(
            st2.reshape(-1), starts, (0,)).reshape(pad_rows, LANES)
        vl2 = jnp.zeros((pad_rows, LANES), jnp.int32)
        vl2 = jax.lax.dynamic_update_slice(
            vl2.reshape(-1), v32, (0,)).reshape(pad_rows, LANES)

        return pl.pallas_call(
            _decode_kernel(R, sub, win, grid),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((R, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows_out, LANES), jnp.uint8),
            scratch_shapes=[
                pltpu.SMEM((3,), jnp.int32),
                pltpu.VMEM((win, LANES), jnp.int32),
                pltpu.VMEM((win, LANES), jnp.int32),
                pltpu.VMEM((win, LANES), jnp.int32),
                pltpu.VMEM((win, LANES), jnp.int32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=_interpret(),
        )(st2, vl2)

    # Bucketed prep (exp24): the cumsum + +inf/zero padding above runs
    # over the FULL worst-case run capacity (= n slots) and dominated the
    # whole decode (13.6 ms prep vs 7.3 ms kernel at 64 MiB).  Runs are
    # data-dependent, so pick the smallest power-of-8 truncation that
    # covers the traced ``num_runs`` with a lax.switch — compressible
    # streams (mean run ≥ 8 or ≥ 64 bytes) skip ≥ 87.5% of the prep
    # traffic; the worst case falls back to the full capacity.
    caps, seen = [], set()
    for shift in (6, 3, 0):
        c = min(rcap, max(-(-(rcap >> shift) // 1024) * 1024, 1024))
        if c not in seen:
            seen.add(c)
            caps.append(c)
    if len(caps) == 1:
        return run_bucket(caps[0])
    which = sum((num_runs > c).astype(jnp.int32) for c in caps[:-1])
    return jax.lax.switch(
        which, [functools.partial(run_bucket, c) for c in caps])


@functools.partial(jax.jit,
                   static_argnames=("tile_rows", "rows_out", "sub_rows",
                                    "win_rows"))
def rl_decode_pallas(counts: jax.Array, values: jax.Array, num_runs,
                     rows_out: int, tile_rows: int | None = None,
                     sub_rows: int | None = None,
                     win_rows: int | None = None):
    """RL decode on device.  ``counts``/``values``: u8[Rcap] (validity
    bounded by traced ``num_runs``); returns u8[(rows_out,128)] — callers
    slice the flat view ``[:n]``.

    ``win_rows``: static run-window size per tile; None = the always-safe
    R+8 worst case.  Pass :func:`decode_window_rows`'s exact bound when
    host counts are available — an UNDERSIZED window silently corrupts.
    """

    def cv_of_cap(cap):
        return (counts[:cap].astype(jnp.int32),
                values[:cap].astype(jnp.int32))

    return _decode_impl(cv_of_cap, counts.shape[0], num_runs, rows_out,
                        tile_rows, sub_rows, win_rows)


@functools.partial(jax.jit,
                   static_argnames=("tile_rows", "rows_out", "sub_rows",
                                    "win_rows"))
def rl_decode_packed_pallas(packed: jax.Array, num_runs, rows_out: int,
                            tile_rows: int | None = None,
                            sub_rows: int | None = None,
                            win_rows: int | None = None):
    """RL decode directly from :func:`rl_encode_pallas`'s packed i32
    stream (``(start & 0xFF) << 8 | value`` per piece) — device-to-device
    pipelines skip the full-capacity counts/values split entirely; the
    (cheap) start-differencing happens inside the bucketed prep on the
    live truncation only.  The final live run's count is junk here —
    harmless, since only the cumulative starts place runs and nothing
    beyond the last start is read."""

    def cv_of_cap(cap):
        p = packed[:cap]
        s8 = (p >> 8) & 0xFF
        nxt = jnp.concatenate([s8[1:], s8[:1]])
        return (nxt - s8) & 0xFF, p & 0xFF

    return _decode_impl(cv_of_cap, packed.shape[0], num_runs, rows_out,
                        tile_rows, sub_rows, win_rows)
