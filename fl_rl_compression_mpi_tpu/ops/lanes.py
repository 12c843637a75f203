"""Flattened-order lane/sublane primitives for Pallas TPU kernels.

All helpers operate on ``(R, 128)`` i32 register arrays interpreted as one
flat row-major sequence of ``R·128`` elements — the in-VMEM view of a byte
or word stream.  They compose three building blocks that do run at VPU
speed on TPU (experiments/FINDINGS.md: gathers/scatters are scalar-core
"dead"; rolls, selects and reductions are not):

* ``flat_shift_down/up`` — shift the flat sequence by ``m`` (lane roll +
  sublane roll + boundary select; pure vector ops);
* 2-level inclusive scans (``prefix_max/prefix_sum/suffix_min``) — 7 lane
  rounds + log2(R) row rounds;
* monotone routing networks (``compact_lsb``, ``expand_msb``) — move every
  live element by its own distance with data-independent rounds.  For
  distances that are monotone non-decreasing in position (true for stream
  compaction: ``dist = idx − dest``; and for expansion to strictly
  increasing targets), LSB-first down-routing and MSB-first up-routing are
  collision-free — validated by 1000-trial simulation (see round-2 notes)
  and pinned by the parity tests of every kernel built on them.

The networks carry ONE packed i32 per element: ``live<<31 | dist<<16 |
payload16`` — distance bits are consumed as the element moves, so no
second array needs to travel.

This is the machinery the reference implements with thread-scatters and
``atomicOr`` (``/root/reference/src/fl/fl_gpu.cu:700-726``) and the RL
spec implements with scatter compaction (``IMPLEMENTATION-PLAN.md:
83-152``) — re-expressed as fixed-shape vector rounds for the TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

LANES = 128

_I32MIN = -(2 ** 31)
_I32MAX = 2 ** 31 - 1


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def flat_idx(rows: int):
    """Flat row-major index of each element of an (rows, 128) tile."""
    s = (rows, LANES)
    return _iota(s, 0) * LANES + _iota(s, 1)


def flat_shift_down(x: jax.Array, m: int, fill) -> jax.Array:
    """y_flat[p] = x_flat[p+m] (elements move DOWN by m); tail = fill.

    m must be a positive power-of-two style amount with either m < 128 or
    m % 128 == 0 (the only amounts the routing networks use).
    """
    rows = x.shape[0]
    fill = jnp.asarray(fill, x.dtype)
    if m % LANES == 0:
        q = m // LANES
        if q >= rows:
            return jnp.full_like(x, fill)
        y = pltpu.roll(x, rows - q, 0)          # rows move up by q
        return jnp.where(_iota(x.shape, 0) < rows - q, y, fill)
    assert m < LANES
    a = pltpu.roll(x, LANES - m, 1)             # lanes move left by m
    b = pltpu.roll(a, rows - 1, 0)              # + rows up by 1 (borrow)
    y = jnp.where(_iota(x.shape, 1) < LANES - m, a, b)
    return jnp.where(flat_idx(rows) < rows * LANES - m, y, fill)


def flat_shift_up(x: jax.Array, m, fill, rows: int | None = None
                  ) -> jax.Array:
    """y_flat[p] = x_flat[p-m] (elements move UP by m); head = fill.

    ``m`` may be a traced scalar when m < 128 (dynamic lane rotate)."""
    rows = x.shape[0] if rows is None else rows
    fill = jnp.asarray(fill, x.dtype)
    if isinstance(m, int) and m % LANES == 0:
        q = m // LANES
        if q >= rows:
            return jnp.full_like(x, fill)
        y = pltpu.roll(x, q, 0)                 # rows move down by q
        return jnp.where(_iota(x.shape, 0) >= q, y, fill)
    a = pltpu.roll(x, m, 1)                     # lanes move right by m
    b = pltpu.roll(a, 1, 0)                     # + rows down by 1 (borrow)
    y = jnp.where(_iota(x.shape, 1) >= m, a, b)
    return jnp.where(flat_idx(x.shape[0]) >= m, y, fill)


def _row_scan(rowagg: jax.Array, op, fill) -> jax.Array:
    """EXCLUSIVE prefix scan over rows of a per-row aggregate already
    broadcast to (rows, 128)."""
    rows = rowagg.shape[0]
    acc = flat_shift_up(rowagg, LANES, fill)    # rows down by 1
    k = 1
    while k < rows:
        acc = op(acc, flat_shift_up(acc, k * LANES, fill))
        k *= 2
    return acc


def prefix_max_flat(x: jax.Array, fill=_I32MIN) -> jax.Array:
    """Inclusive prefix-max over the flat order."""
    fill = jnp.int32(fill)
    lane = _iota(x.shape, 1)
    p = x
    for k in (1, 2, 4, 8, 16, 32, 64):          # intra-row prefix
        sh = pltpu.roll(p, k, 1)
        p = jnp.maximum(p, jnp.where(lane >= k, sh, fill))
    rowtot = jnp.broadcast_to(jnp.max(p, axis=1, keepdims=True), x.shape)
    return jnp.maximum(p, _row_scan(rowtot, jnp.maximum, fill))


def prefix_sum_flat(x: jax.Array) -> jax.Array:
    """Inclusive prefix-sum over the flat order."""
    lane = _iota(x.shape, 1)
    p = x
    for k in (1, 2, 4, 8, 16, 32, 64):
        sh = pltpu.roll(p, k, 1)
        p = p + jnp.where(lane >= k, sh, 0)
    rowtot = jnp.broadcast_to(p[:, LANES - 1:LANES], x.shape)
    return p + _row_scan(rowtot, jnp.add, 0)


def suffix_min_flat(x: jax.Array, fill=_I32MAX) -> jax.Array:
    """Inclusive SUFFIX-min over the flat order (reverse prefix-min)."""
    fill = jnp.int32(fill)
    lane = _iota(x.shape, 1)
    p = x
    for k in (1, 2, 4, 8, 16, 32, 64):
        sh = pltpu.roll(p, LANES - k, 1)        # lanes left by k
        p = jnp.minimum(p, jnp.where(lane < LANES - k, sh, fill))
    rowtot = jnp.broadcast_to(jnp.min(p, axis=1, keepdims=True), x.shape)
    # exclusive suffix scan over rows
    rows = x.shape[0]
    acc = flat_shift_down(rowtot, LANES, fill)
    k = 1
    while k < rows:
        acc = jnp.minimum(acc, flat_shift_down(acc, k * LANES, fill))
        k *= 2
    return jnp.minimum(p, acc)


def suffix_min_flat_bounded(x: jax.Array, span: int, fill=_I32MAX
                            ) -> jax.Array:
    """Inclusive suffix-min over a BOUNDED window: ``y[p] = min(x[p : p +
    span])`` (span a power of two).  For scans whose true dependency range
    is statically bounded — e.g. the RL 255-byte run cap guarantees the
    next piece boundary within 255 positions — this replaces the global
    suffix scan's full row-doubling ladder with ``log2(span)`` rounds."""
    assert span & (span - 1) == 0, span
    fill = jnp.asarray(fill, x.dtype)
    p = x
    k = 1
    while k < span:
        p = jnp.minimum(p, flat_shift_down(p, k, fill))
        k *= 2
    return p


def prefix_max_flat_bounded(x: jax.Array, span: int, fill=_I32MIN
                            ) -> jax.Array:
    """Inclusive prefix-max over a BOUNDED window: ``y[p] = max(x[p −
    span + 1 : p + 1])`` (span a power of two).  Mirror of
    :func:`suffix_min_flat_bounded` — for scans whose true dependency
    range is statically bounded (e.g. the RL decoder's hole fill, where
    the 255-byte piece cap keeps every hole within 255 slots of its
    run-start or seed), ``log2(span)`` rounds replace the global
    lane-ladder + row-doubling scan."""
    assert span & (span - 1) == 0, span
    fill = jnp.asarray(fill, x.dtype)
    p = x
    k = 1
    while k < span:
        p = jnp.maximum(p, flat_shift_up(p, k, fill))
        k *= 2
    return p


def flat_shift_up_dyn_lane(x: jax.Array, m, fill) -> jax.Array:
    """:func:`flat_shift_up_dyn` for a TRACED ``m`` known < 128: only the
    lane ladder runs (7 rounds), skipping the row ladder entirely.  Used
    by single-sub-tile RL encode where the merge offset is the output
    cursor mod 128."""
    rows = x.shape[0]
    fill = jnp.asarray(fill, x.dtype)
    m = jnp.asarray(m, jnp.int32)
    y = x
    for k in (1, 2, 4, 8, 16, 32, 64):
        a = pltpu.roll(y, k, 1)
        b = pltpu.roll(a, 1, 0)
        sh = jnp.where(_iota(x.shape, 1) >= k, a, b)
        y = jnp.where((m & k) != 0, sh, y)
    return jnp.where(flat_idx(rows) >= m, y, fill)


def flat_shift_up_dyn(x: jax.Array, m, fill) -> jax.Array:
    """y_flat[p] = x_flat[p-m] for p ≥ m, else fill — ``m`` a TRACED
    non-negative scalar < rows·128.

    Bitwise ladder of static flat rotations (each bit of ``m`` applies a
    fixed-amount rotation under a scalar select), so the lowering uses
    only the rolls/selects known to be fast — no dynamic sublane rotate.
    Cost ≈ one prefix scan.  This is what lets routing tiles grow past
    the 2^15-element dist-field cap: sub-tiles are compacted/expanded
    independently and merged with one dynamic shift each (round-2 design;
    see rl_pallas.py)."""
    rows = x.shape[0]
    fill = jnp.asarray(fill, x.dtype)
    m = jnp.asarray(m, jnp.int32)
    y = x
    for k in (1, 2, 4, 8, 16, 32, 64):          # lane part of m
        a = pltpu.roll(y, k, 1)
        b = pltpu.roll(a, 1, 0)
        sh = jnp.where(_iota(x.shape, 1) >= k, a, b)
        y = jnp.where((m & k) != 0, sh, y)
    k = 1
    while k < rows:                              # row part of m
        sh = pltpu.roll(y, k, 0)
        y = jnp.where((m & (k * LANES)) != 0, sh, y)
        k *= 2
    return jnp.where(flat_idx(rows) >= m, y, fill)


def flat_shift_down_dyn(x: jax.Array, m, fill,
                        bound: int | None = None) -> jax.Array:
    """y_flat[p] = x_flat[p+m] for p < rows·128 − m, else fill — ``m`` a
    TRACED non-negative scalar < rows·128 (see flat_shift_up_dyn).

    ``bound``: static exclusive upper bound on ``m`` when the caller
    knows one (e.g. an 8-row-aligned cursor remainder < 1024) — prunes
    the row ladder to log2(bound/128) rounds."""
    rows = x.shape[0]
    fill = jnp.asarray(fill, x.dtype)
    m = jnp.asarray(m, jnp.int32)
    y = x
    for k in (1, 2, 4, 8, 16, 32, 64):          # lane part of m
        a = pltpu.roll(y, LANES - k, 1)
        b = pltpu.roll(a, rows - 1, 0)
        sh = jnp.where(_iota(x.shape, 1) < LANES - k, a, b)
        y = jnp.where((m & k) != 0, sh, y)
    k = 1
    while k < rows and (bound is None or k * LANES < bound):
        sh = pltpu.roll(y, rows - k, 0)          # row part of m
        y = jnp.where((m & (k * LANES)) != 0, sh, y)
        k *= 2
    return jnp.where(flat_idx(rows) < rows * LANES - m, y, fill)


# ---------------------------------------------------------------------------
# Monotone routing networks.  Packed word: live<<31 | dist<<16 | payload16
# (dist < 2^14; dead elements are the all-zero word).
# ---------------------------------------------------------------------------

LIVE = -(2 ** 31)   # sign bit: w < 0  ⇔  live (python int; cast at use)
DIST_SHIFT = 16


def pack_route(live: jax.Array, dist: jax.Array, payload16: jax.Array
               ) -> jax.Array:
    return jnp.where(live,
                     jnp.int32(LIVE) | (dist << DIST_SHIFT) | payload16,
                     jnp.int32(0))


def route_payload(w: jax.Array) -> jax.Array:
    return w & jnp.int32(0xFFFF)


def route_live(w: jax.Array) -> jax.Array:
    return w < 0


def compact_lsb(w: jax.Array, nbits: int) -> jax.Array:
    """Route every live element DOWN by its packed distance (monotone
    non-decreasing distances ⇒ collision-free; LSB-first)."""
    assert nbits <= 15, "dist field is bits 16..30: tiles cap at 2^15 elems"
    for k in range(nbits):
        m = 1 << k
        sh = flat_shift_down(w, m, 0)
        take_in = (sh < 0) & ((sh & (m << DIST_SHIFT)) != 0)
        take_self = (w < 0) & ((w & (m << DIST_SHIFT)) != 0)
        w = jnp.where(take_in, sh - (m << DIST_SHIFT),
                      jnp.where(take_self, jnp.int32(0), w))
    return w


def expand_msb(w: jax.Array, nbits: int) -> jax.Array:
    """Route every live element UP by its packed distance (strictly
    increasing targets ⇒ collision-free; MSB-first)."""
    assert nbits <= 15, "dist field is bits 16..30: tiles cap at 2^15 elems"
    for k in reversed(range(nbits)):
        m = 1 << k
        sh = flat_shift_up(w, m, 0)
        take_in = (sh < 0) & ((sh & (m << DIST_SHIFT)) != 0)
        take_self = (w < 0) & ((w & (m << DIST_SHIFT)) != 0)
        w = jnp.where(take_in, sh - (m << DIST_SHIFT),
                      jnp.where(take_self, jnp.int32(0), w))
    return w


def pack_route_wide(live: jax.Array, dist: jax.Array) -> jax.Array:
    """WIDE routing word: ``live<<31 | dist`` with dist in bits 0..30 —
    no payload field.  In the two-array networks the payload rides in
    the second array, so dist can use the whole word, lifting the
    routing-tile cap from 2^15 elements to 2^31.  NOTE the round-4
    refutation (FINDINGS.md exp48): BIG tiles measured 3-10x SLOWER on
    chip for the dense FL general kernel — the wide layout is kept for
    kernels whose structure it simplifies (single-sub RL tiles), not as
    a license to grow tiles."""
    return jnp.where(live, jnp.int32(LIVE) | dist, jnp.int32(0))


def compact_lsb2_wide(ctrl: jax.Array, pay: jax.Array, nbits: int):
    """Two-array compaction with the WIDE ctrl layout (dist at bit 0,
    ≤ 30 bits); see :func:`compact_lsb2`."""
    assert nbits <= 30, nbits
    for k in range(nbits):
        m = 1 << k
        shc = flat_shift_down(ctrl, m, 0)
        shp = flat_shift_down(pay, m, 0)
        take_in = (shc < 0) & ((shc & m) != 0)
        take_self = (ctrl < 0) & ((ctrl & m) != 0)
        ctrl = jnp.where(take_in, shc - m,
                         jnp.where(take_self, jnp.int32(0), ctrl))
        pay = jnp.where(take_in, shp, pay)
    return ctrl, pay


def expand_msb2_wide(ctrl: jax.Array, pay: jax.Array, nbits: int):
    """Two-array expansion with the WIDE ctrl layout (dist at bit 0,
    ≤ 30 bits); see :func:`expand_msb2`."""
    assert nbits <= 30, nbits
    for k in reversed(range(nbits)):
        m = 1 << k
        shc = flat_shift_up(ctrl, m, 0)
        shp = flat_shift_up(pay, m, 0)
        take_in = (shc < 0) & ((shc & m) != 0)
        take_self = (ctrl < 0) & ((ctrl & m) != 0)
        ctrl = jnp.where(take_in, shc - m,
                         jnp.where(take_self, jnp.int32(0), ctrl))
        pay = jnp.where(take_in, shp, pay)
    return ctrl, pay


def compact_lsb2(ctrl: jax.Array, pay: jax.Array, nbits: int):
    """Two-array compaction: ``ctrl`` (i32) carries live|dist as in
    :func:`compact_lsb`; ``pay`` (any 32-bit dtype) rides along.  Dead
    slots of ``pay`` hold junk — mask with ``ctrl < 0`` liveness."""
    assert nbits <= 15, "dist field is bits 16..30: tiles cap at 2^15 elems"
    for k in range(nbits):
        m = 1 << k
        shc = flat_shift_down(ctrl, m, 0)
        shp = flat_shift_down(pay, m, 0)
        take_in = (shc < 0) & ((shc & (m << DIST_SHIFT)) != 0)
        take_self = (ctrl < 0) & ((ctrl & (m << DIST_SHIFT)) != 0)
        ctrl = jnp.where(take_in, shc - (m << DIST_SHIFT),
                         jnp.where(take_self, jnp.int32(0), ctrl))
        pay = jnp.where(take_in, shp, pay)
    return ctrl, pay


def expand_msb2(ctrl: jax.Array, pay: jax.Array, nbits: int):
    """Two-array expansion: ``ctrl`` (i32) carries live|dist as in
    :func:`expand_msb`; ``pay`` (any 32-bit dtype) rides along."""
    assert nbits <= 15, "dist field is bits 16..30: tiles cap at 2^15 elems"
    for k in reversed(range(nbits)):
        m = 1 << k
        shc = flat_shift_up(ctrl, m, 0)
        shp = flat_shift_up(pay, m, 0)
        take_in = (shc < 0) & ((shc & (m << DIST_SHIFT)) != 0)
        take_self = (ctrl < 0) & ((ctrl & (m << DIST_SHIFT)) != 0)
        ctrl = jnp.where(take_in, shc - (m << DIST_SHIFT),
                         jnp.where(take_self, jnp.int32(0), ctrl))
        pay = jnp.where(take_in, shp, pay)
    return ctrl, pay
