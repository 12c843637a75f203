"""Dense-on-device FL encode: the container's packed byte stream is
assembled ON the TPU — no host fold.

Round-1 analysis (experiments/FINDINGS.md §dense) found bit-granular
device assembly "dead" because producing packed *bytes* per frame needs
per-lane dynamic addressing.  The word-granular reformulation here
sidesteps that entirely:

* a group of 8 fields (= 8 u32 words = 32 input values) at frame width
  ``b`` packs to EXACTLY ``b`` whole u32 words (32·b bits), and every
  frame is 4 such groups, so the reference's dense stream
  (``/root/reference/src/fl/fl_gpu.cu:700-726`` semantics) is a
  concatenation of word-aligned group payloads;
* the group pack is a static funnel per width variant: for each b, each
  output word draws fixed bit-windows from fixed neighbor lanes —
  generated as (out-slot, field, shift) terms at trace time, applied as
  masked shift-ORs over lane-rolled copies of the spread fields;
* placement is the monotone routing network (``lanes.compact_lsb2`` —
  a two-array variant carrying the full 32-bit word), with the same
  sequential-grid cursor + carry-row + dynamic-offset DMA emitter as the
  RL encoder.

Output: the exact ``values`` stream as u32 words (host slices the byte
view to the exact size computed from the widths), plus the per-frame
widths in the (rows, 4)-u8 layout shared with `fl_pallas`.
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
from .fl_pallas import (_b_lane_mxu, _frame_widths_fpr_mxu,
                        _word_widths_f32exp)
from .lanes import LANES, flat_idx

# Tile cap: the routing word carries dist in bits 16..30, so a tile may
# hold at most 2^15 elements -> 256 rows (measured 31 GB/s on chip).
# Decode tiles also reach 256: although their workspace is R·128 + the
# 1024-slot alignment headroom (> 2^15 slots at R=256), the true maximum
# routing DISTANCE is `7·(groups−1) + 1024` — a word's displacement from
# its window slot to its output group grows only by (8−b) per group — and
# that stays under 2^15 (exp26; the earlier 128 cap used the conservative
# workspace-size bound).
DENSE_TILE_R = int(os.environ.get("FLRL_DENSE_TILE_R", "256"))
DENSE_DEC_TILE_R = int(os.environ.get("FLRL_DENSE_DEC_TILE_R", "256"))
# The single-width kernels carry no routing dist fields (static masks
# only), so the 2^15 cap does not apply — they use BIGGER tiles so that
# even a width-1 stream's blocks stay DMA-efficient (fb·R/8 rows: 128
# rows = 64 KB at fb=1, R=1024; at R=256 a w4 decode read only 64-row/
# 32 KB blocks and measured SLOWER than the general window decoder).
DENSE_UNIFORM_TILE_R = int(os.environ.get("FLRL_DENSE_UNIFORM_TILE_R",
                                          "1024"))


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _dense_pad_rows(R: int) -> int:
    """Tail slack rows of the encoder's dense buffer: at least R + 32
    (emitter headroom + the decoder's clipped-window needs) and a
    multiple of 2R — hence of every uniform-kernel block Kr = fb·R/8,
    fb | 8 — so the speculative fast encoders can share the exact output
    shape with the general kernel (lax.cond branches must agree)."""
    return 2 * R * max(1, -(-(R + 32) // (2 * R)))


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _pack_terms(b: int):
    """(out_slot j, field k, shift) terms for packing one 8-field group at
    width b: field k's 4b bits live at group-bit offset 4bk; out word j
    holds group bits [32j, 32j+32)."""
    terms = []
    for k in range(8):
        lo = 4 * b * k
        hi = lo + 4 * b
        for j in range(lo // 32, (hi - 1) // 32 + 1):
            terms.append((j, k, lo - 32 * j))
    return terms


def _pack_groups(fields: jax.Array, b_lane: jax.Array,
                 wmin: int = 1) -> jax.Array:
    """Funnel-pack each 8-lane group of spread fields into its first
    ``b`` lanes (full u32 words of the dense stream); lanes ≥ b junk.

    ``wmin``: static lower bound on the widths present — variants below
    it are skipped entirely (the width-subset specialization; callers
    guarantee no real frame is narrower, by the widths header on decode
    or by the speculation flag on encode)."""
    lane8 = _iota(fields.shape, 1) % 8
    rot = {}

    def ROT(d):
        d %= LANES
        if d not in rot:
            rot[d] = fields if d == 0 else pltpu.roll(fields, d, 1)
        return rot[d]

    out = jnp.zeros_like(fields)
    for b in range(wmin, 9):
        vb = jnp.zeros_like(fields)
        for j, k, shift in _pack_terms(b):
            src = ROT(j - k)
            t = (src << shift) if shift >= 0 else (src >> -shift)
            vb = vb | jnp.where(lane8 == j, t, jnp.uint32(0))
        out = jnp.where(b_lane == b, vb, out)
    return out


# ---------------------------------------------------------------------------
# Uniform-width static routing (fast path).
#
# When EVERY frame of a full tile has the same width b ∈ {1,2,4,8} — the
# common case in practice: zeros → 1, low-entropy streams → 2/4, natural
# imagery → 8 — the placement permutation is FIXED: word (r, 8k+j), j<b,
# goes to flat slot 16·b·r + b·k + j.  The routing rounds then need no
# per-element dist bookkeeping (no prefix-sum, no ctrl array): the
# take-in mask of every LSB-first round is a trace-time constant,
# simulated here in NumPy, and each round is one roll + one select on a
# single array.  Decomposition (validated by the same simulation and the
# parity tests): 7 lane-local rounds (lane 8k+j → bk+j, per-lane masks),
# log2(8/b) static merge rounds (8/b rows' 16b-lane segments → one row),
# and ≤ 8 stride-row rounds (row (8/b)·i → i, per-row masks).  b = 8 is
# the identity everywhere and degrades to a cursor-shifted copy.
# Non-power-of-two uniform widths and partial (tail) tiles take the
# general path.
# ---------------------------------------------------------------------------

def _sim_compact(dist: np.ndarray, live: np.ndarray):
    """LSB-first scatter simulation over one axis → [(m, take_mask)];
    at round m the applier does ``y = where(take, shift_down(y, m), y)``."""
    n = dist.size
    pos = np.arange(n)
    rem = np.where(live, dist, 0).copy()
    rounds = []
    maxd = int(rem.max())
    m = 1
    while m <= maxd:
        take = np.zeros(n, bool)
        for e in np.nonzero(live)[0]:
            if rem[e] & m:
                take[pos[e] - m] = True
                pos[e] -= m
                rem[e] -= m
        rounds.append((m, take))
        m <<= 1
    assert np.array_equal(pos[live], (np.arange(n) - dist)[live])
    return rounds


def _sim_expand(dist: np.ndarray, live: np.ndarray):
    """MSB-first scatter simulation (moves UP) → [(m, take_mask)];
    applier: ``y = where(take, shift_up(y, m), y)``."""
    n = dist.size
    pos = np.arange(n)
    rem = np.where(live, dist, 0).copy()
    rounds = []
    maxd = int(rem.max())
    m = 1 << (maxd.bit_length() - 1) if maxd else 0
    while m:
        take = np.zeros(n, bool)
        for e in np.nonzero(live)[0]:
            if rem[e] & m:
                take[pos[e] + m] = True
                pos[e] += m
                rem[e] -= m
        rounds.append((m, take))
        m >>= 1
    assert np.array_equal(pos[live], (np.arange(n) + dist)[live])
    return rounds


def _sim_compact_flat(dist: np.ndarray, live: np.ndarray):
    """Vectorized :func:`_sim_compact` over a FLAT index space (n up to
    R·128): one LSB-first round per dist bit, destinations collected as
    full-array take masks.  Trace-time only; the asserts prove the
    network collision-free for this exact (R, b) configuration, so the
    on-device applier needs no liveness/dist bookkeeping at all."""
    n = dist.size
    pos = np.arange(n)
    rem = np.where(live, dist, 0).astype(np.int64)
    rounds = []
    m = 1
    maxd = int(rem.max()) if n else 0
    while m <= maxd:
        sel = live & ((rem & m) != 0)
        take = np.zeros(n, bool)
        take[pos[sel] - m] = True
        # a mover may never land on a live element that stays this round
        assert take.sum() == sel.sum()
        assert not np.intersect1d(pos[sel] - m, pos[live & ~sel]).size
        pos = pos - np.where(sel, m, 0)
        rem = rem - np.where(sel, m, 0)
        rounds.append((m, take))
        m <<= 1
    assert np.array_equal(pos[live], (np.arange(n) - dist)[live])
    return rounds


def _sim_expand_flat(dist: np.ndarray, live: np.ndarray):
    """MSB-first flat expansion simulation (moves UP); see
    :func:`_sim_compact_flat`."""
    n = dist.size
    pos = np.arange(n)
    rem = np.where(live, dist, 0).astype(np.int64)
    rounds = []
    maxd = int(rem.max()) if n else 0
    m = 1 << (maxd.bit_length() - 1) if maxd else 0
    while m:
        sel = live & ((rem & m) != 0)
        take = np.zeros(n, bool)
        take[pos[sel] + m] = True
        assert take.sum() == sel.sum()
        assert not np.intersect1d(pos[sel] + m, pos[live & ~sel]).size
        pos = pos + np.where(sel, m, 0)
        rem = rem - np.where(sel, m, 0)
        rounds.append((m, take))
        m >>= 1
    assert np.array_equal(pos[live], (np.arange(n) + dist)[live])
    return rounds


def _mask_words(per_b_rounds: dict, size: int, max_words: int = 1):
    """Bit-pack the simulated take masks: bit ``t`` of word ``t // 31``
    is round-slot ``t``'s mask (Pallas kernels cannot capture vector
    constants — FINDINGS.md — so the masks travel as one tiny i32 input
    per word, fetched once thanks to the constant block index, and each
    round unpacks its bit with a shift+and).  Returns (words
    i32[size, W], {b: [(m, word, slot), …]}) or (None, None) when the
    round count exceeds ``max_words``·31 (R=1024 row masks fit one word
    — 29 rounds; R=2048 needs two: 32)."""
    need = sum(sum(1 for _, t in rs if t.any())
               for rs in per_b_rounds.values())
    W = max(1, -(-need // 31))
    if W > max_words:
        return None, None
    words = np.zeros((size, W), np.int64)
    slots = {}
    s = 0
    for b, rounds in per_b_rounds.items():
        lst = []
        for m, take in rounds:
            if take.any():
                w, bit = divmod(s, 31)
                words[:, w] |= take.astype(np.int64) << bit
                lst.append((m, w, bit))
                s += 1
        slots[b] = lst
    return words.astype(np.int32), slots


# Row-mask word budget: 2 words cover R = 2048 (the single-width
# kernels' 31-bit slot cap was the R=1024 bound — VERDICT r3 item 4).
_ROW_MASK_WORDS = 2


def _uniform_place_masks(R: int):
    """Mask words + slot tables for the encode placement of every fast
    width: (lane_words (1,128) i32, row_words (R,W) i32, slots)."""
    lanes_ = np.arange(LANES)
    rows = np.arange(R)
    lane_rounds, row_rounds = {}, {}
    for b in FAST_BS:
        live = (lanes_ % 8) < b
        lane_rounds[b] = _sim_compact(
            np.where(live, (8 - b) * (lanes_ // 8), 0), live)
        S = 8 // b
        rlive = rows % S == 0
        row_rounds[b] = _sim_compact(
            np.where(rlive, rows - rows // S, 0), rlive)
    lw, lslots = _mask_words(lane_rounds, LANES)
    rw, rslots = _mask_words(row_rounds, R, _ROW_MASK_WORDS)
    if lslots is None or rslots is None or R % 8 != 0:
        # slot overflow (huge R override) or odd tile: general path only
        return (np.zeros((1, LANES), np.int32), np.zeros((R, 1), np.int32),
                None)
    return (lw.reshape(1, LANES), rw,
            {b: (lslots[b], rslots[b]) for b in FAST_BS})


def _uniform_unplace_masks(R: int):
    """Mask words + slot tables for the decode inverse placement."""
    lanes_ = np.arange(LANES)
    rows = np.arange(R)
    lane_rounds, row_rounds = {}, {}
    for b in FAST_BS:
        live = lanes_ < 16 * b
        lane_rounds[b] = _sim_expand(
            np.where(live, (lanes_ // b) * 8 + lanes_ % b - lanes_, 0),
            live)
        S = 8 // b
        rlive = rows < R // S
        row_rounds[b] = _sim_expand(
            np.where(rlive, rows * S - rows, 0), rlive)
    lw, lslots = _mask_words(lane_rounds, LANES)
    rw, rslots = _mask_words(row_rounds, R, _ROW_MASK_WORDS)
    if lslots is None or rslots is None or R % 8 != 0:
        # slot overflow (huge R override) or odd tile: general path only
        return (np.zeros((1, LANES), np.int32), np.zeros((R, 1), np.int32),
                None)
    return (lw.reshape(1, LANES), rw,
            {b: (lslots[b], rslots[b]) for b in FAST_BS})


# ---------------------------------------------------------------------------
# Odd-width (b ∈ {3,5,6,7}) uniform static routing.
#
# 16·b ∤ 128 for these widths, so the separable lane/merge/stride
# decomposition above does not exist — but the placement permutation of a
# uniform tile is STILL fixed: word (r, 8k+j), j<b → flat 16·b·r + b·k + j.
# The LSB-first compaction over the FLAT tile therefore has trace-time
# constant take masks too; they just aren't separable, so each round's
# mask is a full (R,128) bit plane (≤31 rounds per i32 plane, the planes
# travel as one (P·R,128) kernel input fetched once).  ~13–15 rounds per
# width at R=256 (max dist 16·R·(8−b)) vs the general network's 15
# two-array rounds + prefix-sum + ctrl packing — about half the vector
# work, and no 2^15 dist cap since no dist field travels.
# ---------------------------------------------------------------------------

ODD_BS = (3, 5, 6, 7)
_MAX_PLANES = 3


def _mask_planes(per_b_rounds: dict, n: int):
    """Bit-pack full-array take masks into ≤ _MAX_PLANES i32 planes
    (31 bits each).  Returns (planes i32[P, n], {b: [(m, plane, bit),…]})
    or (None, None) when over budget."""
    need = sum(sum(1 for _, t in rs if t.any())
               for rs in per_b_rounds.values())
    P = -(-need // 31) if need else 1
    if P > _MAX_PLANES:
        return None, None
    words = np.zeros((P, n), np.int64)
    slots = {}
    s = 0
    for b, rounds in per_b_rounds.items():
        lst = []
        for m, take in rounds:
            if take.any():
                p, bit = divmod(s, 31)
                words[p] |= take.astype(np.int64) << bit
                lst.append((m, p, bit))
                s += 1
        slots[b] = lst
    return words.astype(np.int32), slots


def _odd_place_masks(R: int):
    """Flat take-mask planes for the encode placement of every odd fast
    width: (planes i32[(P·R),128], {b: [(m, plane, bit),…]})."""
    if R > 1024:               # plane VMEM bound (512 KB/plane at 1024)
        return np.zeros((R, LANES), np.int32), None
    n = R * LANES
    fidx = np.arange(n)
    per_b = {}
    try:
        for b in ODD_BS:
            live = (fidx % 8) < b
            rank = np.cumsum(live) - live      # exclusive rank among live
            per_b[b] = _sim_compact_flat(np.where(live, fidx - rank, 0),
                                         live)
    except AssertionError:
        # an unprovable (R, b) configuration degrades to the general
        # network instead of crashing production encode (ADVICE r2)
        return np.zeros((R, LANES), np.int32), None
    words, slots = _mask_planes(per_b, n)
    if words is None:
        return np.zeros((R, LANES), np.int32), None
    return words.reshape(-1, LANES), slots


def _odd_unplace_masks(R: int):
    """Flat take-mask planes for the decode inverse placement."""
    if R > 1024:               # plane VMEM bound (512 KB/plane at 1024)
        return np.zeros((R, LANES), np.int32), None
    n = R * LANES
    fidx = np.arange(n)
    per_b = {}
    try:
        for b in ODD_BS:
            live = fidx < 16 * b * R
            g = fidx // b
            dest = 128 * (g // 16) + 8 * (g % 16) + fidx % b
            per_b[b] = _sim_expand_flat(np.where(live, dest - fidx, 0),
                                        live)
    except AssertionError:
        # see _odd_place_masks: degrade to the general path, never crash
        return np.zeros((R, LANES), np.int32), None
    words, slots = _mask_planes(per_b, n)
    if words is None:
        return np.zeros((R, LANES), np.int32), None
    return words.reshape(-1, LANES), slots


def _flat_place(y: jax.Array, b: int, fp: jax.Array, slots) -> jax.Array:
    """Static flat placement for odd uniform widths: packed group words
    (live lanes 8k+j, j<b) → flat-front K = 16·b·R words; stale copies
    remain beyond K (the usual junk contract)."""
    R = y.shape[0]
    for m, p, s in slots[b]:
        take = ((fp[p * R:(p + 1) * R] >> s) & 1) != 0
        y = jnp.where(take, lanes.flat_shift_down(y, m, 0), y)
    return y


def _flat_unplace(y: jax.Array, b: int, fp: jax.Array, slots) -> jax.Array:
    """Inverse of :func:`_flat_place`: flat-front K words → live lane
    layout (lanes 8k+j, j<b; other lanes junk)."""
    R = y.shape[0]
    for m, p, s in slots[b]:
        take = ((fp[p * R:(p + 1) * R] >> s) & 1) != 0
        y = jnp.where(take, lanes.flat_shift_up(y, m, 0), y)
    return y


def _uniform_place(y: jax.Array, b: int, R: int, lm: jax.Array,
                   rm: jax.Array, slots) -> jax.Array:
    """Static placement: packed group words (live lanes 8k+j, j<b) →
    flat-front K = 16·b·R words.  Stale copies remain beyond K (same
    junk contract as ``lanes.compact_lsb2`` dead slots).  ``lm``/``rm``:
    the (1,128)/(R,1) mask words from :func:`_uniform_place_masks`."""
    assert R % 8 == 0
    S = 8 // b
    lane_i = _iota(y.shape, 1)
    lslots, rslots = slots[b]
    for m, _, s in lslots:                           # A: lane-local
        sh = pltpu.roll(y, LANES - m, 1)
        y = jnp.where(((lm >> s) & 1) != 0, sh, y)
    seg = 16 * b
    for t in range(S.bit_length() - 1):              # B: merge rows
        w = seg << t
        sh = pltpu.roll(pltpu.roll(y, R - (1 << t), 0), w, 1)
        y = jnp.where((lane_i >= w) & (lane_i < 2 * w), sh, y)
    for m, w, s in rslots:                           # C: stride rows
        sh = pltpu.roll(y, R - m, 0)
        y = jnp.where(((rm[:, w:w + 1] >> s) & 1) != 0, sh, y)
    return y


def _uniform_unplace(y: jax.Array, b: int, R: int, lm: jax.Array,
                     rm: jax.Array, slots) -> jax.Array:
    """Inverse of :func:`_uniform_place`: flat-front K words → live lane
    layout (lanes 8k+j, j<b; other lanes junk)."""
    assert R % 8 == 0
    row_i = _iota(y.shape, 0)
    lane_i = _iota(y.shape, 1)
    lslots, rslots = slots[b]
    for m, w, s in rslots:                           # C': stride rows
        sh = pltpu.roll(y, m, 0)
        y = jnp.where(((rm[:, w:w + 1] >> s) & 1) != 0, sh, y)
    seg = 16 * b
    S = 8 // b
    for t in reversed(range(S.bit_length() - 1)):    # B': un-merge
        w = seg << t
        sh = pltpu.roll(pltpu.roll(y, 1 << t, 0), LANES - w, 1)
        y = jnp.where((lane_i < w)
                      & (row_i % (2 << t) == (1 << t)), sh, y)
    for m, _, s in lslots:                           # A': lane expand
        sh = pltpu.roll(y, m, 1)
        y = jnp.where(((lm >> s) & 1) != 0, sh, y)
    return y


def _pack_groups_b(fields: jax.Array, b: int) -> jax.Array:
    """Single-width variant of :func:`_pack_groups` (b static): lanes
    8k+j, j<b of each group hold the payload words; others junk."""
    lane8 = _iota(fields.shape, 1) % 8
    rot = {}

    def ROT(d):
        d %= LANES
        if d not in rot:
            rot[d] = fields if d == 0 else pltpu.roll(fields, d, 1)
        return rot[d]

    if b == 8:
        # identity: every term is (j == k, shift 0) — the select-OR sum
        # reconstructs the input verbatim, so skip the 8 rounds
        return fields
    vb = jnp.zeros_like(fields)
    for j, k, shift in _pack_terms(b):
        src = ROT(j - k)
        t = (src << shift) if shift >= 0 else (src >> -shift)
        vb = vb | jnp.where(lane8 == j, t, jnp.uint32(0))
    return vb


def _unpack_groups_b(packed: jax.Array, b: int) -> jax.Array:
    """Single-width variant of :func:`_unpack_groups`."""
    if b == 8:
        return packed          # identity (see _pack_groups_b)
    lane8 = _iota(packed.shape, 1) % 8
    rot = {}

    def ROT(d):
        d %= LANES
        if d not in rot:
            rot[d] = packed if d == 0 else pltpu.roll(packed, d, 1)
        return rot[d]

    mask4b = jnp.uint32((1 << (4 * b)) - 1 if b < 8 else 0xFFFFFFFF)
    vb = jnp.zeros_like(packed)
    for k, j, shift in _unpack_terms(b):
        src = ROT(k - j)
        t = (src >> shift) if shift >= 0 else (src << -shift)
        vb = vb | jnp.where(lane8 == k, t & mask4b, jnp.uint32(0))
    return vb


FAST_BS = (1, 2, 4, 8)


def _encode_kernel(R: int, grid: int, slots, oslots, debug_path=False,
                   wmin: int = 1, route_nbits: int | None = None):
    full_nbits = (R * LANES - 1).bit_length()
    nbits = (full_nbits if route_nbits is None
             else min(route_nbits, full_nbits))
    # Speculative stream-plan mode (round 4): the caller guessed a width
    # floor and/or a routing-round bound from the host probe; the kernel
    # verifies BOTH per tile at zero vector cost (the widths check rides
    # the compact (R,4) reduce, the distance check is a scalar derived
    # from K — `8g − egp(g)` is monotone in g, so the tile max is
    # `8·g_last − egp(g_last) ≤ 8·g_last − K + 8`) and raises a flag; a
    # miss re-runs the default kernel (same contract as the uniform
    # speculation, fl_jax.encode).
    spec = wmin > 1 or nbits < full_nbits

    def kernel(nf_ref, w_ref, lm_ref, rm_ref, fp_ref, bits_ref, out_ref,
               total_ref, woff_ref, *rest):
        if spec:
            flag_ref, rest = rest[0], rest[1:]
        if debug_path:
            path_ref, carry, carry_row, merged, sem = rest
        else:
            carry, carry_row, merged, sem = rest
        i = pl.program_id(0)
        n_frames = nf_ref[0]

        @pl.when(i == 0)
        def _():
            carry[0] = 0           # emitted-word cursor
            carry_row[...] = jnp.zeros((1, LANES), jnp.uint32)
            if spec:
                flag_ref[0] = 0
        # the cursor at tile start is exactly the decoder's per-tile word
        # offset (fl_decode_dense_pallas's ``woffs``) — emit it so
        # device-to-device round trips skip the host offset scan
        woff_ref[i] = carry[0]

        w = w_ref[...].astype(jnp.uint32)
        o = w | (w >> 8)
        o = (o | (o >> 16)) & jnp.uint32(0xFF)
        wq = _word_widths_f32exp(o)
        b_fpr = _frame_widths_fpr_mxu(wq, 32)
        bits_ref[...] = b_fpr.astype(jnp.uint8)
        if wmin > 1:
            # width-floor speculation check (pad frames are width 1 and
            # must not trip it)
            fmask = (_iota((R, 4), 0) * 4 + _iota((R, 4), 1)
                     + i * R * 4) < n_frames
            flag_ref[0] = flag_ref[0] | jnp.any(
                (b_fpr < wmin) & fmask).astype(jnp.int32)

        fidx = flat_idx(R)
        lane8 = _iota((R, LANES), 1) % 8
        gword = i * R * LANES + fidx
        frame_ok = (gword >> 5) < n_frames      # 32 words per frame

        # Uniform-width dispatch (see the static-routing comments above):
        # a FULL tile whose frames all share one width takes trace-time-
        # simulated placement — separable masks for b0 ∈ {1,2,4,8}, flat
        # mask planes for b0 ∈ {3,5,6,7}; everything else (mixed widths,
        # the tail tile) takes the general network.  The check runs on
        # the compact (R,4) widths — 32× fewer elements than b_lane —
        # and b_lane itself (one MXU op) plus the variable-width Horner
        # spread are deferred into the general branch: uniform tiles use
        # a constant-shift spread for their static b instead.
        b0 = b_fpr[0, 0]
        full = (((i + 1) * R * LANES - 1) >> 5) < n_frames
        uniform = jnp.logical_not(jnp.any(b_fpr != b0)) & full
        is_pow = (b0 == 1) | (b0 == 2) | (b0 == 4) | (b0 == 8)
        is_fast = (uniform & is_pow if slots is not None
                   else jnp.bool_(False))
        is_odd = (uniform & jnp.logical_not(is_pow) if oslots is not None
                  else jnp.bool_(False))
        if debug_path:  # per-tile dispatch record: 0 general/1 pow2/2 odd
            path_ref[i] = jnp.where(is_fast, 1,
                                    jnp.where(is_odd, 2, 0)).astype(
                                        jnp.int32)

        cc = carry[0] % LANES
        out_row = carry[0] // LANES
        # The previous tile's DMA is awaited only here (it overlapped this
        # tile's compute); starting the next strictly after keeps the
        # overlapping junk-tail overwrites in order.
        dst = out_ref.at[pl.ds(out_row, R + 8)]

        @pl.when(i > 0)
        def _():
            pltpu.make_async_copy(merged, dst, sem).wait()

        def finish(pay, K):
            """Cursor-shift the tile's K-word payload, stage it for the
            emit DMA, and save the straddling row + K for the common
            tail.  (Registers cannot cross pl.when branches, so each
            branch finishes its own payload; K travels via carry[1].)

            Aligned-cursor fast paths: uniform tiles emit K = 16·b·R — a
            multiple of 128 words for every b when R % 8 == 0 — so on
            uniform streams ``cc`` stays 0 tile after tile: the 7-round
            dynamic shift is branch-skipped, and the straddling-row
            reduce runs only when the NEXT tile will actually read it
            ((cc+K) % 128 ≠ 0)."""
            padded = jnp.concatenate(
                [pay, jnp.zeros((8, LANES), jnp.uint32)], axis=0)

            @pl.when(cc == 0)
            def _():
                merged[...] = padded

            @pl.when(cc != 0)
            def _():
                sh = lanes.flat_shift_up(padded, cc, 0)
                sh = jnp.where((_iota((R + 8, LANES), 0) == 0)
                               & (_iota((R + 8, LANES), 1) < cc),
                               carry_row[...], sh)
                merged[...] = sh

            @pl.when((cc + K) % LANES != 0)
            def _():
                # (bitcast through i32: Mosaic has no unsigned
                # reductions; a one-nonzero-row sum is bit-identical)
                carry_row[...] = jax.lax.bitcast_convert_type(
                    jnp.sum(jnp.where(
                        _iota((R + 8, LANES), 0) == (cc + K) // LANES,
                        jax.lax.bitcast_convert_type(merged[...],
                                                     jnp.int32),
                        jnp.int32(0)), axis=0, keepdims=True),
                    jnp.uint32)
            carry[1] = K

        def spread_b(fb):
            """Constant-shift spread for a uniform width-``fb`` tile
            (every byte < 2^fb ⇒ the ORs are disjoint); b = 8 is the
            identity."""
            if fb == 8:
                return w
            return ((w & jnp.uint32(0xFF))
                    | (((w >> 8) & jnp.uint32(0xFF)) << fb)
                    | (((w >> 16) & jnp.uint32(0xFF)) << (2 * fb))
                    | ((w >> 24) << (3 * fb)))

        @pl.when(jnp.logical_not(is_fast | is_odd))
        def _():
            b_lane = _b_lane_mxu(b_fpr, 32)
            m = jnp.uint32(1) << b_lane.astype(jnp.uint32)
            r = w >> 24
            r = r * m + ((w >> 16) & jnp.uint32(0xFF))
            r = r * m + ((w >> 8) & jnp.uint32(0xFF))
            fields = r * m + (w & jnp.uint32(0xFF))
            packed = _pack_groups(fields, b_lane, wmin)
            # placement: group g's payload starts at the cumulative b-sum
            # of prior groups in this tile; cross-tile base is the cursor
            live = (lane8 < b_lane) & frame_ok
            gb = jnp.where((lane8 == 0) & frame_ok, b_lane, 0)
            incl = lanes.prefix_sum_flat(gb)
            # exclusive-of-own-group prefix for EVERY lane: the inclusive
            # sum counts this group's head (lane8 == 0 ≤ every lane of
            # the group), and the group's width is b_lane at all lanes
            egp = incl - jnp.where(frame_ok, b_lane, 0)
            dest = egp + lane8
            dist = fidx - dest
            K = jnp.max(incl)
            ctrl = jnp.where(
                live,
                jnp.int32(lanes.LIVE) | (dist << lanes.DIST_SHIFT),
                jnp.int32(0))
            if nbits < full_nbits:
                # routing-round speculation check, scalar-only: the tile
                # max distance is 8·g_last − egp(g_last) ≤ 8·g_last − K
                # + 8 (monotone in g; w_last ≤ 8), all already in hand
                lf = jnp.minimum((i + 1) * R * 4, n_frames) - i * R * 4
                bound = 8 * (lf * 4 - 1) - K + 8
                flag_ref[0] = flag_ref[0] | (
                    (lf > 0) & (bound > (1 << nbits) - 1)).astype(
                        jnp.int32)
            ctrl, pay = lanes.compact_lsb2(ctrl, packed, nbits)
            finish(pay, K)

        for fb in (FAST_BS if slots is not None else ()):
            @pl.when(is_fast & (b0 == fb))
            def _(fb=fb):
                pk = _pack_groups_b(spread_b(fb), fb)
                finish(_uniform_place(pk, fb, R, lm_ref[...],
                                      rm_ref[...], slots),
                       jnp.int32(16 * fb * R))

        for fb in (ODD_BS if oslots is not None else ()):
            @pl.when(is_odd & (b0 == fb))
            def _(fb=fb):
                pk = _pack_groups_b(spread_b(fb), fb)
                finish(_flat_place(pk, fb, fp_ref[...], oslots),
                       jnp.int32(16 * fb * R))

        K = carry[1]
        pltpu.make_async_copy(merged, dst, sem).start()

        @pl.when(i == grid - 1)
        def _():
            pltpu.make_async_copy(merged, dst, sem).wait()

        carry[0] = carry[0] + K
        total_ref[0] = carry[0]
    return kernel


@functools.partial(jax.jit, static_argnames=("tile_r", "debug_path",
                                              "odd_tiles", "wmin",
                                              "route_nbits"))
def fl_encode_dense_pallas(words: jax.Array, n_frames: jax.Array,
                           tile_r: int | None = None,
                           debug_path: bool = False,
                           odd_tiles: bool = True,
                           wmin: int = 1,
                           route_nbits: int | None = None):
    """Dense FL encode.  ``words`` u32[NW] (NW a tile multiple, bytes
    beyond the input zero); ``n_frames`` = ceil(n/128) (traced).

    Returns ``(bits2d u8[rows, 4], dense u32[(rows+pad)·128],
    total_words i32[], woffs i32[grid])`` — ``woffs`` are the per-tile
    stream word offsets :func:`fl_decode_dense_pallas` wants (valid when
    the decoder uses the same tile size); ``dense.view(u8)[:values_size]``
    is the exact
    reference byte stream (trailing bits of the tail frame's last word
    are zero by the zero-pad contract).  The tail slack ``pad =
    _dense_pad_rows(R)`` (the emitter itself needs tile+8) lets
    :func:`fl_decode_dense_pallas` consume the buffer directly — its
    clipped window reads need ``rows + R + 16`` rows to exist — and is a
    multiple of every uniform-kernel block so the speculative fast
    encoders (:func:`fl_encode_dense_uniform_pallas`) share the shape.

    ``wmin``/``route_nbits`` (round 4): a speculative stream plan —
    static width floor (pack variants below it skipped) and/or routing
    round bound (LSB rounds above it skipped).  When either is active
    the kernel verifies both per tile (the widths check rides the
    compact (R,4) reduce; the distance check is a scalar derived from
    K, since ``8g − egp(g)`` is monotone in g) and a FIFTH return value
    ``flag`` (i32[]) is appended: nonzero means the plan was violated
    and ``dense``/``woffs`` are junk — re-run with the defaults.
    ``bits2d`` is exact either way.
    """
    R = DENSE_TILE_R if tile_r is None else tile_r
    nw = words.shape[0]
    assert nw % (R * LANES) == 0
    grid = nw // (R * LANES)
    full_nbits = (R * LANES - 1).bit_length()
    spec = wmin > 1 or (route_nbits is not None
                        and route_nbits < full_nbits)
    lw, rw, slots = _uniform_place_masks(R)
    if odd_tiles:
        fpw, oslots = _odd_place_masks(R)
    else:
        # odd_tiles=False drops the always-resident (3R,128) flat mask
        # planes and the 4 odd-width dispatch branches: odd-UNIFORM
        # tiles then take the general network (correct, just not
        # odd-fast).  Callers pick this variant for streams with no
        # odd-uniform tiles.
        fpw, oslots = np.zeros((8, LANES), np.int32), None

    out_specs_extra = []
    out_shape_extra = []
    if spec:
        out_specs_extra.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        out_shape_extra.append(jax.ShapeDtypeStruct((1,), jnp.int32))
    if debug_path:
        out_specs_extra.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        out_shape_extra.append(jax.ShapeDtypeStruct((grid,), jnp.int32))

    outs = pl.pallas_call(
        _encode_kernel(R, grid, slots, oslots, debug_path,
                       wmin=wmin, route_nbits=route_nbits),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((R, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, rw.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fpw.shape[0], LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + out_specs_extra,
        out_shape=[
            jax.ShapeDtypeStruct((nw // LANES, 4), jnp.uint8),
            jax.ShapeDtypeStruct((nw // LANES + _dense_pad_rows(R),
                                  LANES), jnp.uint32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((grid,), jnp.int32),
        ] + out_shape_extra,
        scratch_shapes=[
            pltpu.SMEM((2,), jnp.int32),
            pltpu.VMEM((1, LANES), jnp.uint32),
            pltpu.VMEM((R + 8, LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(jnp.asarray(n_frames, jnp.int32).reshape(1),
      words.reshape(nw // LANES, LANES), jnp.asarray(lw),
      jnp.asarray(rw), jnp.asarray(fpw))
    bits2d, dense, total, woffs = outs[:4]
    ret = (bits2d, dense.reshape(-1), total[0], woffs)
    k = 4
    if spec:
        ret = ret + (outs[k][0],)
        k += 1
    if debug_path:
        ret = ret + (outs[k],)
    return ret


# ---------------------------------------------------------------------------
# Dense decode: container byte stream -> output, entirely on device.
# ---------------------------------------------------------------------------

def _unpack_terms(b: int):
    """(field k, word slot j, shift) terms for unpacking one 8-field group
    at width b: field k recovers bits [4bk, 4bk+4b) of the group stream;
    ``shift`` ≥ 0 means ``word_j >> shift``, < 0 means ``word_j << -shift``
    (the cross-word high part)."""
    terms = []
    for k in range(8):
        lo = 4 * b * k
        hi = lo + 4 * b
        for j in range(lo // 32, (hi - 1) // 32 + 1):
            terms.append((k, j, lo - 32 * j))
    return terms


def _unpack_groups(packed: jax.Array, b_lane: jax.Array,
                   wmin: int = 1) -> jax.Array:
    """Inverse of :func:`_pack_groups`: group payload words (first b lanes
    of each 8-lane group) -> spread fields at every lane.  ``wmin`` as in
    :func:`_pack_groups` (the decode caller knows it exactly from the
    widths header)."""
    lane8 = _iota(packed.shape, 1) % 8
    rot = {}

    def ROT(d):
        d %= LANES
        if d not in rot:
            rot[d] = packed if d == 0 else pltpu.roll(packed, d, 1)
        return rot[d]

    out = jnp.zeros_like(packed)
    for b in range(wmin, 9):
        mask4b = jnp.uint32((1 << (4 * b)) - 1 if b < 8 else 0xFFFFFFFF)
        vb = jnp.zeros_like(packed)
        for k, j, shift in _unpack_terms(b):
            # field lane l (l%8 == k) reads packed word lane l - k + j
            src = ROT(k - j)
            t = (src >> shift) if shift >= 0 else (src << -shift)
            vb = vb | jnp.where(lane8 == k, t & mask4b, jnp.uint32(0))
        out = jnp.where(b_lane == b, vb, out)
    return out


def _decode_kernel(R: int, grid: int, slots, oslots, wmin: int = 1,
                   route_nbits: int | None = None):
    HEADR = 8                  # 8-row (1024-slot) alignment headroom
    HEAD = HEADR * LANES
    W = R + 2 * HEADR          # window rows (DMA'd dense words)
    G = R * (LANES // 8)       # groups per tile
    # Max routing distance (markers down, data up): a group-g word's
    # displacement is `8g − rem − egp(g) + HEAD` and egp(g) ≥ g (every
    # group emits ≥ 1 word), so |dist| ≤ 7·(G−1) + HEAD — far below the
    # workspace size, which is what lets R reach 256 within the 15-bit
    # dist field (exp26).  ``route_nbits``: exact bound from the widths
    # header — both networks' dists are ≤ HEAD + max(8g − egp(g)), which
    # the host computes for free at decode time (round 4).
    nbits = (7 * (G - 1) + HEAD).bit_length()
    if route_nbits is not None:
        nbits = min(nbits, route_nbits)

    def kernel(woff_ref, nf_ref, lm_ref, rm_ref, fp_ref, bits_ref,
               dense_hbm, out_ref, win_a, win_b, ywin, sem_a, sem_b):
        i = pl.program_id(0)
        n_frames = nf_ref[0]
        nrows = dense_hbm.shape[0]

        def arow_of(j):
            return jnp.clip((woff_ref[j] // LANES) & ~7, 0, nrows - W)

        @pl.when(i == 0)
        def _():
            pltpu.make_async_copy(dense_hbm.at[pl.ds(arow_of(0), W)],
                                  win_a, sem_a).start()

        def body(win, sem, nwin, nsem):
            # The per-tile window offsets are precomputed on host (SMEM
            # input), so the next tile's window DMA depends on nothing:
            # issue it first and let it overlap this whole tile's compute.
            @pl.when(i < grid - 1)
            def _():
                pltpu.make_async_copy(
                    dense_hbm.at[pl.ds(arow_of(i + 1), W)],
                    nwin, nsem).start()
            pltpu.make_async_copy(
                dense_hbm.at[pl.ds(arow_of(i), W)], win, sem).wait()
            rem = woff_ref[i] - arow_of(i) * LANES

            # Uniform-width dispatch (mirror of the encoder's): a FULL
            # tile whose frames all share b0 ∈ {1,2,4,8} skips the
            # marker routing + fill + two-array expansion for the
            # trace-time static inverse permutation.
            bits4 = bits_ref[...].astype(jnp.int32)
            b0 = bits4[0, 0]
            full = (((i + 1) * R * LANES - 1) >> 5) < n_frames
            uniform = jnp.logical_not(jnp.any(bits4 != b0)) & full
            is_pow = (b0 == 1) | (b0 == 2) | (b0 == 4) | (b0 == 8)
            is_fast = (uniform & is_pow if slots is not None
                       else jnp.bool_(False))
            is_odd = (uniform & jnp.logical_not(is_pow)
                      if oslots is not None else jnp.bool_(False))

            # Stream-align the window ONCE for every fast branch (rem <
            # 8·128 by the aligned-DMA contract); uniform streams keep
            # woffs row-aligned (K per tile = 16·b·R words, a 128
            # multiple), so rem == 0 branch-skips the 10-round dynamic
            # shift on the common path.
            if slots is not None or oslots is not None:
                @pl.when(is_fast | is_odd)
                def _():
                    @pl.when(rem == 0)
                    def _():
                        ywin[...] = win[...][:R]

                    @pl.when(rem != 0)
                    def _():
                        ywin[...] = lanes.flat_shift_down_dyn(
                            win[...], rem, 0, bound=8 * LANES)[:R]

            def emit(f, fb):
                mask = jnp.uint32((1 << fb) - 1)
                s1 = f >> fb
                s2 = s1 >> fb
                s3 = s2 >> fb
                out_ref[...] = ((f & mask) | ((s1 & mask) << 8)
                                | ((s2 & mask) << 16)
                                | ((s3 & mask) << 24))

            for fb in (FAST_BS if slots is not None else ()):
                @pl.when(is_fast & (b0 == fb))
                def _(fb=fb):
                    emit(_unpack_groups_b(
                        _uniform_unplace(ywin[...], fb, R, lm_ref[...],
                                         rm_ref[...], slots), fb), fb)

            for fb in (ODD_BS if oslots is not None else ()):
                @pl.when(is_odd & (b0 == fb))
                def _(fb=fb):
                    emit(_unpack_groups_b(
                        _flat_unplace(ywin[...], fb, fp_ref[...],
                                      oslots), fb), fb)

            @pl.when(jnp.logical_not(is_fast | is_odd))
            def _():
                _general(win, rem)

        def _general(win, rem):
            # per-frame widths -> per-lane (MXU broadcast, fields decode)
            b4 = bits_ref[...].astype(jnp.int32).astype(jnp.float32)
            selT = (jax.lax.broadcasted_iota(jnp.int32, (4, LANES), 0)
                    == jax.lax.broadcasted_iota(jnp.int32, (4, LANES), 1)
                    // 32).astype(jnp.float32)
            b_lane = jnp.dot(b4, selT,
                             preferred_element_type=jnp.float32).astype(
                                 jnp.int32)

            fidx = flat_idx(R)
            lane8 = _iota((R, LANES), 1) % 8
            gword = i * R * LANES + fidx
            frame_ok = (gword >> 5) < n_frames
            gb = jnp.where((lane8 == 0) & frame_ok, b_lane, 0)
            incl = lanes.prefix_sum_flat(gb)
            egp = incl - jnp.where(frame_ok, b_lane, 0)
            K = jnp.max(incl)

            # 1. route one marker per group from workspace slot 1024+8g
            #    down to window slot rem+egp(g); payload = delta + 1024
            mlive = (lane8 == 0) & frame_ok
            delta = fidx - rem - egp       # == 8g - rem - egp at heads
            mdist = HEAD + delta
            mpay = delta + HEAD            # > 0, < HEAD + 128R
            ws = jnp.concatenate([
                jnp.zeros((HEADR, LANES), jnp.int32),
                lanes.pack_route(mlive, mdist, mpay),
                jnp.zeros((W - R - HEADR, LANES), jnp.int32)], axis=0)
            ws = lanes.compact_lsb(ws, nbits)

            # 2. fill: every window slot learns its group's delta.  A
            #    group's payload spans b ≤ 8 window slots, so its marker
            #    is within 7 slots — an 8-span bounded scan (3 rounds)
            #    replaces the global lane-ladder + row-doubling scan.
            #    The fill word packs (slot+1) above a 15-BIT payload
            #    (mpay ≤ 7·(G−1)+HEAD < 2^15): a 16-bit payload field
            #    would push slot 2^15−1's word past int32 and flip its
            #    sign, losing max-ordering for the window's last rows
            #    (R=256 windows have 34k slots).
            sidx = flat_idx(W)
            fv = jnp.where(ws < 0,
                           ((sidx + 1) << 15) | (ws & jnp.int32(0x7FFF)),
                           jnp.int32(0))
            filled = lanes.prefix_max_flat_bounded(fv, 8, 0)
            delta_q = (filled & jnp.int32(0x7FFF)) - HEAD

            # 3. expand window data up to output positions (+HEAD offset)
            dlive = (sidx >= rem) & (sidx < rem + K)
            ddist = delta_q + HEAD         # out' = q + delta + HEAD
            ctrl = jnp.where(
                dlive,
                jnp.int32(lanes.LIVE) | (ddist << lanes.DIST_SHIFT),
                jnp.int32(0))
            pay = jnp.concatenate([win[...], jnp.zeros((HEADR, LANES),
                                                       jnp.uint32)], axis=0)
            ctrl = jnp.concatenate([ctrl, jnp.zeros((HEADR, LANES),
                                                    jnp.int32)], axis=0)
            ctrl, pay = lanes.expand_msb2(ctrl, pay, nbits)
            packed = pay[HEADR:HEADR + R]

            # 4. unpack groups -> spread fields -> unspread -> bytes
            f = _unpack_groups(packed, b_lane, wmin)
            b = b_lane.astype(jnp.uint32)
            mask = (jnp.uint32(1) << b) - jnp.uint32(1)
            s1 = f >> b
            s2 = s1 >> b
            s3 = s2 >> b
            out_ref[...] = ((f & mask) | ((s1 & mask) << 8)
                            | ((s2 & mask) << 16) | ((s3 & mask) << 24))

        @pl.when(i % 2 == 0)
        def _():
            body(win_a, sem_a, win_b, sem_b)

        @pl.when(i % 2 == 1)
        def _():
            body(win_b, sem_b, win_a, sem_a)
    return kernel


@functools.partial(jax.jit, static_argnames=("tile_r", "odd_tiles",
                                              "wmin", "route_nbits"))
def fl_decode_dense_pallas(dense2d: jax.Array, bits2d: jax.Array,
                           woffs: jax.Array, n_frames: jax.Array,
                           tile_r: int | None = None,
                           odd_tiles: bool = True,
                           wmin: int = 1,
                           route_nbits: int | None = None) -> jax.Array:
    """Dense FL decode: the container's packed stream (u32-word view,
    zero-padded) + per-frame widths -> decoded words, on device.

    ``dense2d``: u32[(pad_rows,128)]; ``bits2d``: u8[(rows,4)] frame
    widths; ``woffs``: i32[grid] per-tile word offsets into the stream
    (4·Σb of prior frames — the decoder-side offset scan,
    ``/root/reference/src/fl/fl_gpu.cu:596-601``, done once on host).
    Returns u32[(rows,128)] decoded words (slice the byte view to n).

    ``wmin``/``route_nbits``: EXACT stream plan from the widths header
    (:func:`host_route_plan`) — unlike the encoder's speculative twin,
    no flag is needed; a wrong plan here is a caller bug.
    """
    R = DENSE_DEC_TILE_R if tile_r is None else tile_r
    rows = bits2d.shape[0]
    assert rows % R == 0
    grid = rows // R
    assert woffs.shape[0] == grid
    lw, rw, slots = _uniform_unplace_masks(R)
    if odd_tiles:
        fpw, oslots = _odd_unplace_masks(R)
    else:
        # see fl_encode_dense_pallas(odd_tiles=False); the DECODER's
        # caller knows exactly from the widths header whether any tile
        # is odd-uniform
        fpw, oslots = np.zeros((8, LANES), np.int32), None

    out = pl.pallas_call(
        _decode_kernel(R, grid, slots, oslots, wmin=wmin,
                       route_nbits=route_nbits),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, rw.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fpw.shape[0], LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((R, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((R + 16, LANES), jnp.uint32),
            pltpu.VMEM((R + 16, LANES), jnp.uint32),
            pltpu.VMEM((R, LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(woffs, jnp.asarray(n_frames, jnp.int32).reshape(1),
      jnp.asarray(lw), jnp.asarray(rw), jnp.asarray(fpw), bits2d, dense2d)
    return out


# ---------------------------------------------------------------------------
# Globally-uniform fast kernels + speculative auto dispatch.
#
# Real low-entropy streams are very often uniform-width over the WHOLE
# array (zeros → 1, sensor/low-cardinality data → 2/4, the bench
# stream → 4).  For those, the per-tile dispatch machinery of the
# general kernels (uniformity checks, 9 traced branches, odd mask
# planes, cursor carries, oversized emits) costs ~20-25% (chip bisect,
# exp46: a stripped single-width encoder pairs at ~99 GB/s on w4 / ~249
# on w8 vs ~77/~201 production).  The stripped kernels below assume ONE
# static width fb ∈ {1,2,4,8} for every tile: placement offsets become
# static (tile i's payload is exactly rows [i·Kr, (i+1)·Kr),
# Kr = fb·R/8), so both kernels are pure BlockSpec pipelines — no
# cursor, no manual DMA, no routing bookkeeping beyond the trace-time
# masks.
#
# Dispatch is SPECULATIVE on encode (widths are not known up front) and
# lives on the HOST (ops/fl_jax.py): a free NumPy probe of the first
# tile picks fb; the fast kernel verifies every REAL frame as it
# encodes (it computes the widths anyway) and raises a flag on any
# mismatch, in which case the caller re-runs the general kernel — the
# wasted fast pass costs about half a general pass, and only on streams
# whose FIRST tile is uniform but a later one is not.  In-jit
# lax.switch/cond compositions were A/B'd on chip and REFUTED (exp47):
# they copy branch results and lose the stripped kernels' win.  Decode
# needs no speculation: the widths header is in hand, so the host
# checks it exactly.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _odd_single_masks(R: int, fb: int, inverse: bool = False):
    """Flat take-mask plane(s) for ONE odd width (the stripped
    single-width kernels need only their own width's rounds — ≤ ~17 at
    R=1024, so one 31-bit plane suffices where the 4-width per-tile
    planes need three).  Returns (planes i32[(P·R),128], slots) or
    (zeros, None) when unprovable/over budget."""
    n = R * LANES
    fidx = np.arange(n)
    try:
        if not inverse:
            live = (fidx % 8) < fb
            rank = np.cumsum(live) - live
            rounds = _sim_compact_flat(np.where(live, fidx - rank, 0),
                                       live)
        else:
            live = fidx < 16 * fb * R
            g = fidx // fb
            dest = 128 * (g // 16) + 8 * (g % 16) + fidx % fb
            rounds = _sim_expand_flat(np.where(live, dest - fidx, 0),
                                      live)
    except AssertionError:
        return np.zeros((R, LANES), np.int32), None
    words, slots = _mask_planes({fb: rounds}, n)
    if words is None:
        return np.zeros((R, LANES), np.int32), None
    return words.reshape(-1, LANES), slots


UNIFORM_BS = (1, 2, 3, 4, 5, 6, 7, 8)


def _uniform_enc_kernel_mr(fb: int, R: int, P: int, slots):
    """Multi-ref single-width encode (round 4b, exp53): the grid step
    reads its R input rows as P separate BlockSpec refs of Rb = R/P
    rows (index maps absorb the block-level placement), so the
    stride-row ladder shrinks to log2(Rb/2) rounds AND every routing
    round runs on a quarter-size working set — w4 pair 103 → 160 GB/s
    stripped.  Same outputs/contract as :func:`_uniform_enc_kernel`.

    Odd widths (round 5): block k's payload is exactly Kb = fb·Rb/8
    whole rows for ANY fb (Rb % 8 == 0), so the same ref split applies
    with the Rb-scale flat mask plane(s) in place of the separable
    lane/row masks — one mask input instead of two."""
    Rb = R // P
    Kb = fb * Rb // 8
    odd = fb not in FAST_BS

    def kernel(*refs):
        nf_ref = refs[0]
        ins = refs[1:1 + P]
        nmask = 1 if odd else 2
        mrefs = refs[1 + P:1 + P + nmask]
        bits_ref, out_ref, flag_ref = refs[1 + P + nmask:4 + P + nmask]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            flag_ref[0] = 0

        bits_parts, outs = [], []
        bad = jnp.zeros((), jnp.bool_)
        for k in range(P):
            w = ins[k][...].astype(jnp.uint32)
            o = w | (w >> 8)
            o = (o | (o >> 16)) & jnp.uint32(0xFF)
            wq = _word_widths_f32exp(o)
            b_fpr = _frame_widths_fpr_mxu(wq, 32)
            bits_parts.append(b_fpr.astype(jnp.uint8))
            fmask = (_iota((Rb, 4), 0) * 4 + _iota((Rb, 4), 1)
                     + (i * P + k) * Rb * 4) < nf_ref[0]
            bad = bad | jnp.any((b_fpr != fb) & fmask)
            if fb == 8:
                pay = w
            else:
                sp = ((w & jnp.uint32(0xFF))
                      | (((w >> 8) & jnp.uint32(0xFF)) << fb)
                      | (((w >> 16) & jnp.uint32(0xFF)) << (2 * fb))
                      | ((w >> 24) << (3 * fb)))
                pk = _pack_groups_b(sp, fb)
                if odd:
                    pay = _flat_place(pk, fb, mrefs[0][...], slots)
                else:
                    pay = _uniform_place(pk, fb, Rb, mrefs[0][...],
                                         mrefs[1][...], slots)
            outs.append(pay[:Kb])
        flag_ref[0] = flag_ref[0] | bad.astype(jnp.int32)
        bits_ref[...] = jnp.concatenate(bits_parts, axis=0)
        out_ref[...] = jnp.concatenate(outs, axis=0)
    return kernel


def _uniform_enc_kernel(fb: int, R: int, slots, oslots):
    Kr = fb * R // 8

    def kernel(nf_ref, w_ref, lm_ref, rm_ref, fp_ref, bits_ref, out_ref,
               flag_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            flag_ref[0] = 0

        w = w_ref[...].astype(jnp.uint32)
        o = w | (w >> 8)
        o = (o | (o >> 16)) & jnp.uint32(0xFF)
        wq = _word_widths_f32exp(o)
        b_fpr = _frame_widths_fpr_mxu(wq, 32)
        bits_ref[...] = b_fpr.astype(jnp.uint8)

        # speculation check: every REAL frame of this tile must have
        # width fb (pad frames beyond n_frames are zeros → width 1 and
        # must not trip the flag; their junk payload lands beyond
        # values_size, and REAL frames' static offsets are unaffected
        # by anything after them)
        fmask = (_iota((R, 4), 0) * 4 + _iota((R, 4), 1)
                 + i * R * 4) < nf_ref[0]
        bad = jnp.any((b_fpr != fb) & fmask)
        flag_ref[0] = flag_ref[0] | bad.astype(jnp.int32)

        if fb == 8:
            pay = w
        else:
            sp = ((w & jnp.uint32(0xFF))
                  | (((w >> 8) & jnp.uint32(0xFF)) << fb)
                  | (((w >> 16) & jnp.uint32(0xFF)) << (2 * fb))
                  | ((w >> 24) << (3 * fb)))
            pk = _pack_groups_b(sp, fb)
            if fb in FAST_BS:
                pay = _uniform_place(pk, fb, R, lm_ref[...], rm_ref[...],
                                     slots)
            else:
                # odd width: static flat mask plane(s), one width's
                # rounds only (round-4 stripped odd kernels)
                pay = _flat_place(pk, fb, fp_ref[...], oslots)
        out_ref[...] = pay[:Kr]
    return kernel


@functools.partial(jax.jit, static_argnames=("fb", "tile_r", "nref"))
def fl_encode_dense_uniform_pallas(words: jax.Array, n_frames: jax.Array,
                                   fb: int, tile_r: int | None = None,
                                   nref: int = 1):
    """Speculative single-width dense encode: assumes EVERY real frame
    has width ``fb`` ∈ 1..8 (odd widths use single-width flat mask
    planes — round 4).  Returns ``(bits2d, dense, flag)`` — ``flag``
    nonzero means the assumption failed and ``dense`` is junk (callers
    re-run :func:`fl_encode_dense_pallas`); ``bits2d`` is always the
    true widths.

    ``nref`` > 1 (round 4b, exp53): the MULTI-REF variant — the tile's
    R rows arrive as nref BlockSpec refs of R/nref rows, shrinking the
    stride ladder and the per-round working set (w4 pair 103 → ~160
    GB/s).  Only for fb ∈ {1,2,4} (w8 is identity placement; odd
    widths use non-separable flat planes)."""
    R = DENSE_UNIFORM_TILE_R if tile_r is None else tile_r
    assert fb in UNIFORM_BS and R % 8 == 0
    nw = words.shape[0]
    assert nw % (R * LANES) == 0
    grid = nw // (R * LANES)
    Kr = fb * R // 8
    rows = nw // LANES
    if nref > 1:
        assert fb in (1, 2, 3, 4, 5, 6, 7) and R % (8 * nref) == 0
        Rb = R // nref
        Kb = fb * Rb // 8
        if fb in FAST_BS:
            lw, rw, slots = _uniform_place_masks(Rb)
            assert slots is not None
            mask_arrs = [jnp.asarray(lw), jnp.asarray(rw)]
            mask_specs = [
                pl.BlockSpec((1, LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Rb, rw.shape[1]), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)]
        else:
            fpw, slots = _odd_single_masks(Rb, fb)
            assert slots is not None
            mask_arrs = [jnp.asarray(fpw)]
            mask_specs = [
                pl.BlockSpec((fpw.shape[0], LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)]
        w2d = words.reshape(rows, LANES)
        bits2d, dense, flag = pl.pallas_call(
            _uniform_enc_kernel_mr(fb, R, nref, slots),
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec((Rb, LANES),
                            lambda i, k=k: (nref * i + k, 0),
                            memory_space=pltpu.VMEM)
               for k in range(nref)]
            + mask_specs,
            out_specs=[
                pl.BlockSpec((R, 4), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nref * Kb, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((rows, 4), jnp.uint8),
                jax.ShapeDtypeStruct((rows * fb // 8
                                      + _dense_pad_rows(R), LANES),
                                     jnp.uint32),
                jax.ShapeDtypeStruct((1,), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=_interpret(),
        )(jnp.asarray(n_frames, jnp.int32).reshape(1),
          *((w2d,) * nref), *mask_arrs)
        return bits2d, dense, flag[0]
    lw, rw, slots = _uniform_place_masks(R)
    if fb in FAST_BS:
        assert slots is not None
        fpw, oslots = np.zeros((8, LANES), np.int32), None
    else:
        fpw, oslots = _odd_single_masks(R, fb)
        assert oslots is not None

    bits2d, dense, flag = pl.pallas_call(
        _uniform_enc_kernel(fb, R, slots, oslots),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((R, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, rw.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fpw.shape[0], LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kr, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, 4), jnp.uint8),
            jax.ShapeDtypeStruct((rows + _dense_pad_rows(R), LANES),
                                 jnp.uint32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(jnp.asarray(n_frames, jnp.int32).reshape(1),
      words.reshape(rows, LANES), jnp.asarray(lw), jnp.asarray(rw),
      jnp.asarray(fpw))
    return bits2d, dense, flag[0]


def _uniform_dec_kernel_mr(fb: int, R: int, P: int, slots):
    """Multi-ref single-width decode (see :func:`_uniform_enc_kernel_mr`):
    P refs of Kb dense rows each, unplaced at the R/P scale (odd widths
    use the Rb-scale flat plane(s) — round 5)."""
    Rb = R // P
    Kb = fb * Rb // 8
    odd = fb not in FAST_BS

    def kernel(*refs):
        ins = refs[:P]
        nmask = 1 if odd else 2
        mrefs = refs[P:P + nmask]
        out_ref = refs[P + nmask]
        mask = jnp.uint32((1 << fb) - 1)
        outs = []
        for k in range(P):
            y = jnp.concatenate(
                [ins[k][...].astype(jnp.uint32),
                 jnp.zeros((Rb - Kb, LANES), jnp.uint32)], axis=0)
            if odd:
                y = _flat_unplace(y, fb, mrefs[0][...], slots)
            else:
                y = _uniform_unplace(y, fb, Rb, mrefs[0][...],
                                     mrefs[1][...], slots)
            f = _unpack_groups_b(y, fb)
            s1 = f >> fb
            s2 = s1 >> fb
            s3 = s2 >> fb
            outs.append((f & mask) | ((s1 & mask) << 8)
                        | ((s2 & mask) << 16) | ((s3 & mask) << 24))
        out_ref[...] = jnp.concatenate(outs, axis=0)
    return kernel


def _uniform_dec_kernel(fb: int, R: int, slots, oslots):
    def kernel(d_ref, lm_ref, rm_ref, fp_ref, out_ref):
        mask = jnp.uint32((1 << fb) - 1 if fb < 8 else 0xFFFFFFFF)
        if fb == 8:
            f = d_ref[...].astype(jnp.uint32)
        else:
            y = jnp.concatenate(
                [d_ref[...].astype(jnp.uint32),
                 jnp.zeros((R - fb * R // 8, LANES), jnp.uint32)],
                axis=0)
            if fb in FAST_BS:
                y = _uniform_unplace(y, fb, R, lm_ref[...], rm_ref[...],
                                     slots)
            else:
                y = _flat_unplace(y, fb, fp_ref[...], oslots)
            f = _unpack_groups_b(y, fb)
        s1 = f >> fb
        s2 = s1 >> fb
        s3 = s2 >> fb
        out_ref[...] = ((f & mask) | ((s1 & mask) << 8)
                        | ((s2 & mask) << 16) | ((s3 & mask) << 24))
    return kernel


@functools.partial(jax.jit, static_argnames=("fb", "rows_out", "tile_r",
                                              "nref"))
def fl_decode_dense_uniform_pallas(dense2d: jax.Array, fb: int,
                                   rows_out: int,
                                   tile_r: int | None = None,
                                   nref: int = 1) -> jax.Array:
    """Single-width dense decode: the stream is consumed in exact
    static blocks (tile i reads rows [i·Kr, (i+1)·Kr)) — a pure
    BlockSpec pipeline, no window DMA, no offset scan.  Valid only when
    every frame's width is ``fb`` ∈ 1..8 (callers check the widths
    header).  ``dense2d`` rows must cover ``rows_out·fb/8`` and be a
    multiple of ``Kr`` (the encoders' padded buffers are, by
    construction).  ``nref``: see
    :func:`fl_encode_dense_uniform_pallas` (round 4b, exp53)."""
    R = DENSE_UNIFORM_TILE_R if tile_r is None else tile_r
    assert fb in UNIFORM_BS and R % 8 == 0
    assert rows_out % R == 0
    grid = rows_out // R
    Kr = fb * R // 8
    if nref > 1:
        assert fb in (1, 2, 3, 4, 5, 6, 7) and R % (8 * nref) == 0
        Rb = R // nref
        Kb = fb * Rb // 8
        if fb in FAST_BS:
            lw, rw, slots = _uniform_unplace_masks(Rb)
            assert slots is not None
            mask_arrs = [jnp.asarray(lw), jnp.asarray(rw)]
            mask_specs = [
                pl.BlockSpec((1, LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Rb, rw.shape[1]), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)]
        else:
            fpw, slots = _odd_single_masks(Rb, fb, inverse=True)
            assert slots is not None
            mask_arrs = [jnp.asarray(fpw)]
            mask_specs = [
                pl.BlockSpec((fpw.shape[0], LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)]
        need = grid * Kr
        assert dense2d.shape[0] >= need, (dense2d.shape, need)
        src = dense2d[:need] if dense2d.shape[0] % Kb else dense2d
        return pl.pallas_call(
            _uniform_dec_kernel_mr(fb, R, nref, slots),
            grid=(grid,),
            in_specs=[pl.BlockSpec((Kb, LANES),
                                   lambda i, k=k: (nref * i + k, 0),
                                   memory_space=pltpu.VMEM)
                      for k in range(nref)]
            + mask_specs,
            out_specs=pl.BlockSpec((R, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows_out, LANES),
                                           jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=_interpret(),
        )(*((src,) * nref), *mask_arrs)
    lw, rw, slots = _uniform_unplace_masks(R)
    if fb in FAST_BS:
        assert slots is not None
        fpw, oslots = np.zeros((8, LANES), np.int32), None
    else:
        fpw, oslots = _odd_single_masks(R, fb, inverse=True)
        assert oslots is not None
    need = grid * Kr
    assert dense2d.shape[0] >= need, (dense2d.shape, need)
    src = dense2d[:need] if dense2d.shape[0] % Kr else dense2d

    return pl.pallas_call(
        _uniform_dec_kernel(fb, R, slots, oslots),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((Kr, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, rw.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fpw.shape[0], LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_out, LANES), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(src, jnp.asarray(lw), jnp.asarray(rw), jnp.asarray(fpw))


def uniform_nref(fb: int, R: int) -> int:
    """Chip-tuned multi-ref count for the single-width kernels
    (production-shaped A/B: exp54 at R=1024, exp55 a/b extend the grid
    to nref=2, R=2048, and the round-5 odd-width flat-plane mr; 3
    cycles each, 128 MiB pairs, medians):

    ========== R=1024 ================== R=2048 =============
    w1  74 → 88 (nref=2)           97-104 (nref=4)  ← best
    w2  81 → 103 (nref=4)          112-120 (nref=4) ← best
    w3  99 → 107 (nref=4)          112-113 (nref=4) ← best
    w4  104 → 145 (nref=4)         156-158 (nref=8) ← best
    w5  102 → 107 (nref=4)         111-113 (nref=4) ← best
    w6  120-122 (nref 1 ≈ 4: wash → single-ref)
    w7  108-113 (nref=1; 4 slightly worse → single-ref)
    ==========================================================

    The ladder is CLOSED at both ends (exp54: nref=8 at R=1024 loses
    everywhere; exp55c: w4 2048/16 = 121-124 (-22%), w2/w1 2048/8
    slightly below /4); w8 is identity placement.  Requires
    R % (8·nref) == 0."""
    if fb == 4:
        if R >= 2048 and R % 64 == 0:
            return 8
        if R % 32 == 0:
            return 4
    if fb == 2 and R % 32 == 0:
        return 4
    if fb == 1:
        if R >= 2048 and R % 32 == 0:
            return 4
        if R % 16 == 0:
            return 2
    if fb in (3, 5) and R % 32 == 0:
        return 4
    return 1


def uniform_tile_r(fb: int, rows: int | None = None) -> int:
    """Per-width tile size for the stripped single-width kernels.
    Round-4 (exp48): w8 wins at R=2048 (300-336 vs 266-301 — identity
    placement amortizes fixed cost) while SINGLE-ref w4 loses there
    (90 vs 97-99).  Round-5 (exp55a/b): WITH multi-ref the picture
    flips — the per-round working set is Rb = R/nref, so R=2048 blocks
    amortize DMA/fixed cost without growing the routing working set:
    w4 145→152-158, w2 103→113-120, w1 88→97-104, and (exp55d) the odd
    multi-ref widths too: w3 107→112, w5 107→112.  So every width with
    a multi-ref win — {1,2,3,4,5} — plus identity w8 takes 2048 when
    the buffer divides (``uniform_nref`` supplies the matching nref);
    w6/w7 (single-ref, wash at nref=4) keep the default."""
    base = DENSE_UNIFORM_TILE_R
    if (fb in (1, 2, 3, 4, 5, 8) and base == 1024
            and (rows is None or rows % 2048 == 0)):
        return 2048
    return base


def uniform_kernel_available(fb: int, R: int, inverse: bool = False
                             ) -> bool:
    """True when a stripped single-width kernel exists for (fb, R) at
    the multi-ref split the dispatch table will actually use (the
    masks live at the Rb = R/nref block scale)."""
    if fb not in UNIFORM_BS or R % 8 != 0:
        return False
    Rb = R // uniform_nref(fb, R)
    if fb in FAST_BS:
        masks = (_uniform_unplace_masks(Rb) if inverse
                 else _uniform_place_masks(Rb))
        return masks[2] is not None
    return _odd_single_masks(Rb, fb, inverse)[1] is not None


def host_probe_uniform_b(data: np.ndarray,
                         tile_r: int | None = None) -> int | None:
    """Host-side width probe for the speculative uniform dispatch: the
    data is already in host memory, so checking the FIRST tile costs a
    ~128 KB NumPy pass.  Returns fb ∈ 1..8 when that tile is uniform at
    fb and the static masks exist for this tile size, else None (callers
    use the general kernel).  The device kernel still verifies EVERY
    real frame (its flag is authoritative — a later mixed tile makes the
    caller re-run the general kernel)."""
    R = DENSE_UNIFORM_TILE_R if tile_r is None else tile_r
    if R % 8 != 0 or data.size < R * 512:
        return None
    fmax = np.asarray(data[: R * 512], np.uint8).reshape(-1, 128).max(1)
    b = np.maximum(np.frexp(fmax.astype(np.float64))[1], 1)
    fb = int(b[0])
    if bool((b == fb).all()) and uniform_kernel_available(fb, R):
        return fb
    return None


# ---------------------------------------------------------------------------
# CONSTANT-stream fast path (round 4b).  All-zero (and generally
# constant-byte) streams are the dominant real-world low-entropy class
# — zero pages, sparse tensors — and the RL codec already branch-skips
# its whole pipeline for them (exp36/exp49, 4× on zeros).  The FL dense
# analog: when every byte is one constant c with width fb ∈ {1,2,4,8},
# every payload word is the SAME 32-bit pattern (c's fb bits repeated
# 32/fb times), so encode is read-verify-emit-constant and decode is
# verify-broadcast — no spread, no pack, no placement rounds at all.
# Dispatch follows the uniform-speculation contract: a free host probe
# picks the candidate, the kernel verifies EVERY real word and raises
# a flag, and a miss falls back to the uniform/general chain.
# Validity: c == 0 always (zero padding keeps tail frames exact), or
# n % 128 == 0 (no partial tail frame whose last payload word would
# mix c-bits with pad zeros).
# ---------------------------------------------------------------------------


def const_payload_word(cbyte: int, fb: int) -> int:
    """The 32-bit payload pattern of a constant-``cbyte`` stream at
    width ``fb`` (fb | 8): c's low fb bits repeated 32/fb times."""
    assert fb in FAST_BS
    w = 0
    for i in range(32 // fb):
        w |= (cbyte & ((1 << fb) - 1)) << (fb * i)
    return w


def _const_enc_kernel(fb: int, R: int, cbyte: int):
    Kr = fb * R // 8
    cword = cbyte * 0x01010101
    pword = const_payload_word(cbyte, fb)

    def kernel(nf_ref, w_ref, bits_ref, out_ref, flag_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            flag_ref[0] = 0

        w = w_ref[...]
        gword = i * R * LANES + flat_idx(R)
        real = gword < nf_ref[0] * 32
        bad = jnp.any((w != jnp.uint32(cword & 0xFFFFFFFF)) & real)
        flag_ref[0] = flag_ref[0] | bad.astype(jnp.int32)
        bits_ref[...] = jnp.full((R, 4), fb, jnp.uint8)
        out_ref[...] = jnp.full((Kr, LANES), pword & 0xFFFFFFFF,
                                jnp.uint32)
    return kernel


@functools.partial(jax.jit, static_argnames=("cbyte", "fb", "tile_r"))
def fl_encode_dense_constant_pallas(words: jax.Array, n_frames: jax.Array,
                                    cbyte: int, fb: int,
                                    tile_r: int | None = None):
    """Speculative constant-stream dense encode: assumes EVERY real byte
    equals ``cbyte`` (verified; nonzero ``flag`` means ``dense`` AND
    ``bits2d`` are junk — re-run the uniform/general chain).  Caller
    guarantees ``cbyte == 0 or n % 128 == 0`` (see the section note) and
    ``fb = max(1, cbyte.bit_length()) ∈ {1,2,4,8}``."""
    R = DENSE_UNIFORM_TILE_R if tile_r is None else tile_r
    assert fb in FAST_BS and fb == max(1, int(cbyte).bit_length())
    nw = words.shape[0]
    assert nw % (R * LANES) == 0
    grid = nw // (R * LANES)
    Kr = fb * R // 8
    rows = nw // LANES
    bits2d, dense, flag = pl.pallas_call(
        _const_enc_kernel(fb, R, int(cbyte)),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((R, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kr, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, 4), jnp.uint8),
            jax.ShapeDtypeStruct((rows + _dense_pad_rows(R), LANES),
                                 jnp.uint32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(jnp.asarray(n_frames, jnp.int32).reshape(1),
      words.reshape(rows, LANES))
    return bits2d, dense, flag[0]


def _const_dec_kernel(fb: int, R: int, cbyte: int):
    Kr = fb * R // 8
    cword = cbyte * 0x01010101
    pword = const_payload_word(cbyte, fb)

    def kernel(nv_ref, d_ref, out_ref, flag_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            flag_ref[0] = 0

        d = d_ref[...]
        gword = i * Kr * LANES + flat_idx(Kr)
        vq = nv_ref[0] >> 2               # whole payload words
        rem = nv_ref[0] & 3               # real bytes of the tail word
        # byte-granular compare mask: full words, then the straddling
        # tail word's low `rem` bytes (its pad bytes are buffer zeros)
        tailm = (jnp.uint32(1) << (8 * rem).astype(jnp.uint32)
                 ) - jnp.uint32(1)
        mask = jnp.where(gword < vq, jnp.uint32(0xFFFFFFFF),
                         jnp.where(gword == vq, tailm, jnp.uint32(0)))
        bad = jnp.any(((d ^ jnp.uint32(pword & 0xFFFFFFFF)) & mask)
                      != jnp.uint32(0))
        flag_ref[0] = flag_ref[0] | bad.astype(jnp.int32)
        out_ref[...] = jnp.full((R, LANES), cword & 0xFFFFFFFF,
                                jnp.uint32)
    return kernel


@functools.partial(jax.jit, static_argnames=("cbyte", "fb", "rows_out",
                                              "tile_r"))
def fl_decode_dense_constant_pallas(dense2d: jax.Array, values_size,
                                    cbyte: int, fb: int, rows_out: int,
                                    tile_r: int | None = None):
    """Speculative constant-stream dense decode: verifies the exact
    ``values_size`` payload BYTES (byte-masked straddling tail word —
    its pad bytes are buffer zeros) equal the constant pattern and
    broadcasts ``cbyte``.  Returns ``(out u32[rows_out,128], flag)``;
    nonzero flag → re-run the uniform/general decode."""
    R = DENSE_UNIFORM_TILE_R if tile_r is None else tile_r
    assert fb in FAST_BS and fb == max(1, int(cbyte).bit_length())
    assert rows_out % R == 0
    grid = rows_out // R
    Kr = fb * R // 8
    need = grid * Kr
    assert dense2d.shape[0] >= need
    src = dense2d[:need] if dense2d.shape[0] % Kr else dense2d
    out, flag = pl.pallas_call(
        _const_dec_kernel(fb, R, int(cbyte)),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((Kr, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows_out, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(jnp.asarray(values_size, jnp.int32).reshape(1), src)
    return out, flag[0]


def host_probe_constant(data: np.ndarray, n: int,
                        tile_r: int | None = None):
    """Host probe for the constant fast path: returns ``(cbyte, fb)``
    when the FIRST tile is one constant byte whose width is a fast
    power of two AND the validity rule holds (c == 0, or no partial
    tail frame), else None.  The device flag remains authoritative for
    the rest of the stream."""
    R = DENSE_UNIFORM_TILE_R if tile_r is None else tile_r
    if data.size < R * 512 or n <= 0:
        return None
    head = np.asarray(data[: R * 512], np.uint8)
    c = int(head[0])
    if not bool((head == c).all()):
        return None
    fb = max(1, c.bit_length())
    if fb not in FAST_BS or not (c == 0 or n % 128 == 0):
        return None
    return c, fb


# ---------------------------------------------------------------------------
# Stream plans for the general kernels (round 4): width floor + routing
# round bound.  Exact from the widths header on decode; speculated from
# the first tile (and verified by the kernel flag) on encode.
# ---------------------------------------------------------------------------

def _max_route_dist(widths: np.ndarray, R: int) -> int:
    """max over R-row tiles of max_g (8g − egp(g)) — the general
    networks' max routing distance for this widths sequence.  The
    quantity is monotone in g within a tile (increments 8−w ≥ 0), so
    the per-tile max sits at the last live group and is bounded above
    by ``4·Σ_tile (8−w_f)`` (over the true max by at most 7 — the last
    frame's own trailing groups) — one reshape-sum over the F-byte
    header instead of a 4F-element scan."""
    w = np.asarray(widths, np.int32)
    if w.size == 0:
        return 0
    fpt = R * 4                          # frames per tile
    grid = -(-w.size // fpt)
    wp = np.full(grid * fpt, 8, np.int32)   # pad frames contribute 0
    wp[:w.size] = w
    per_tile = (8 - wp).reshape(grid, fpt).sum(axis=1, dtype=np.int64)
    return int(per_tile.max()) * 4


def host_route_plan(bits: np.ndarray, frames: int,
                    enc_r: int | None = None,
                    dec_r: int | None = None):
    """``(wmin, enc_nbits, dec_nbits)`` plan from a widths header:
    ``wmin`` is the narrowest real frame (pack/unpack variants below it
    are dead code); ``enc_nbits`` bounds the encoder's compaction
    distances (≤ maxd8); ``dec_nbits`` bounds the decoder's marker +
    expansion distances (≤ maxd8 + the 1024-slot window headroom).
    Cost: one cheap NumPy pass over the F-byte header (maxd8 uses the
    per-tile-sum upper bound, ≤ 7 over the true maximum)."""
    enc_r = DENSE_TILE_R if enc_r is None else enc_r
    dec_r = DENSE_DEC_TILE_R if dec_r is None else dec_r
    w = np.asarray(bits[:frames], np.uint8)
    if w.size == 0:
        return 1, None, None
    wmin = int(w.min())
    m_enc = _max_route_dist(w, enc_r)
    m_dec = m_enc if dec_r == enc_r else _max_route_dist(w, dec_r)
    return wmin, max(m_enc.bit_length(), 1), (m_dec + 1024).bit_length()


# Quantization of speculative/exact plans: bounds the number of
# compiled kernel variants (each (wmin, nbits) pair is its own Mosaic
# program; the persistent compile cache amortizes across runs).
_WMIN_CLASSES = (6, 4, 2, 1)
_NBITS_CLASSES = (9, 11, 13, 15)


def quantize_plan(wmin: int, nbits: int | None, full_nbits: int):
    """Round ``wmin`` DOWN and ``nbits`` UP to the class grid; returns
    (wmin_q, nbits_q_or_None) with nbits_q=None when not narrower than
    ``full_nbits``."""
    wq = next((c for c in _WMIN_CLASSES if c <= wmin), 1)
    nq = None
    if nbits is not None:
        nq = next((c for c in _NBITS_CLASSES if c >= nbits), full_nbits)
        if nq >= full_nbits:
            nq = None
    return wq, nq


def host_probe_route_plan(data: np.ndarray, tile_r: int | None = None):
    """SPECULATIVE encode plan from the FIRST general tile (the data is
    in host memory; one ~R·512-byte NumPy pass): width floor = the
    tile's narrowest frame, round bound = 2× the tile's max routing
    distance (one bit of stationarity margin).  The encode kernel
    verifies both per tile (its flag is authoritative) and the caller
    re-runs the default kernel on a miss."""
    R = DENSE_TILE_R if tile_r is None else tile_r
    if data.size < R * 512:
        return 1, None
    fmax = np.asarray(data[: R * 512], np.uint8).reshape(-1, 128).max(1)
    b = np.maximum(np.frexp(fmax.astype(np.float64))[1], 1).astype(
        np.int32)
    maxd8 = int((8 - b).sum()) * 4
    full = (R * LANES - 1).bit_length()
    return quantize_plan(int(b.min()),
                         max((2 * maxd8).bit_length(), 1), full)
