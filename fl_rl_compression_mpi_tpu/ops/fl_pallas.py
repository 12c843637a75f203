"""Pallas TPU kernels for the FL field codec.

The XLA path (`fl_jax.fl_encode_fields`) is correct but loses ~20× to
fusion breaks at reshape/broadcast boundaries (each materializes an
N-byte intermediate in HBM).  These kernels compute the whole field form
in one pass over VMEM-resident tiles:

* tail masking, per-frame width (segmented OR-max via lane rolls —
  frames are ``wpf``-lane segments of the 128-lane rows), width
  broadcast (masked prefix-OR rolls), and the spread — all in registers;
* one HBM read of the input words, one write of the fields, plus a
  quarter-pass write of the per-word width array (``bw``, u8) from which
  the host slices the per-frame ``bits``.

Layout: a tile is ``(TILE_R, 128)`` u32; a frame of L bytes is ``wpf =
L/4`` consecutive lane positions, ``wpf | 128`` (supported L: 16..512).
Grid steps are independent; Pallas double-buffers the HBM↔VMEM pipeline.

Falls back to interpret mode off-TPU (tests run it on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bitpack import FRAME_LENGTH

import os

# Tile rows per op, tuned on the real chip (experiments/exp7: encode is
# compute-heavier and prefers 2048-row tiles at 297 GB/s; decode peaks at
# 1024 rows with 490 GB/s).  FLRL_TILE_R overrides both (tests set 256 so
# interpret-mode cases stay small).
_TILE_OVERRIDE = int(os.environ.get("FLRL_TILE_R", "0"))
ENC_TILE_R = _TILE_OVERRIDE or int(os.environ.get("FLRL_ENC_TILE_R",
                                                  "2048"))
DEC_TILE_R = _TILE_OVERRIDE or int(os.environ.get("FLRL_DEC_TILE_R",
                                                  "1024"))
TILE_R = _TILE_OVERRIDE or max(ENC_TILE_R, DEC_TILE_R)
LANES = 128
TILE_WORDS = TILE_R * LANES       # padding granularity (covers both ops)


def _word_widths_f32exp(o: jax.Array) -> jax.Array:
    """Per-word minimal width ``max(1, bitlen(o))`` via the f32 exponent
    field — 4 ops instead of an 8-step compare chain."""
    f1 = (o | jnp.uint32(1)).astype(jnp.int32).astype(jnp.float32)
    return (jax.lax.bitcast_convert_type(f1, jnp.int32) >> 23) - 126


def _frame_widths_fpr_mxu(wq: jax.Array, wpf: int) -> jax.Array:
    """Per-frame width only (the first matmul of :func:`_frame_widths_mxu`)
    — callers that dispatch on uniformity (ops/fl_dense_pallas.py) defer
    the lane broadcast to the branch that needs it, saving one MXU op on
    every uniform tile."""
    fpr = LANES // wpf
    spacing = (wpf - 1).bit_length() + 1           # 6 for wpf=32
    v = jax.lax.bitcast_convert_type((spacing * wq + 127) << 23,
                                     jnp.float32).astype(jnp.bfloat16)
    sel = (jax.lax.broadcasted_iota(jnp.int32, (LANES, fpr), 0) // wpf
           == jax.lax.broadcasted_iota(jnp.int32, (LANES, fpr), 1)
           ).astype(jnp.bfloat16)
    seg = jnp.dot(v, sel, preferred_element_type=jnp.float32)
    e = (jax.lax.bitcast_convert_type(seg, jnp.int32) >> 23) - 127
    return e // spacing


def _b_lane_mxu(b_fpr: jax.Array, wpf: int) -> jax.Array:
    """Broadcast compact per-frame widths back to every lane (the second
    matmul of :func:`_frame_widths_mxu`)."""
    fpr = LANES // wpf
    selT = (jax.lax.broadcasted_iota(jnp.int32, (fpr, LANES), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (fpr, LANES), 1) // wpf
            ).astype(jnp.bfloat16)
    return jnp.dot(b_fpr.astype(jnp.bfloat16), selT,
                   preferred_element_type=jnp.float32).astype(jnp.int32)


def _frame_widths_mxu(wq: jax.Array, wpf: int):
    """Per-frame width = segment max of per-word widths, via one tiny MXU
    matmul: encode width w as the float 2^(S·w) (S > log2(wpf), so the
    sum's exponent determines the max exactly — float rounding can only
    drop low bits, never crosses an S-boundary), sum words of each frame
    with a one-hot (LANES, fpr) matrix, read the exponent back.

    Returns ``(b_fpr (R, fpr) i32, b_lane (R, LANES) i32)`` — the compact
    per-frame widths and their broadcast back to every lane (a second tiny
    matmul).  Replaces two log-phase lane-roll trees (~30 VPU ops/word).

    The matmul operands are bf16, which is EXACT here (and, A/B'd on chip
    in experiments/exp17, worth ~2-6% end to end over f32 operands — the
    K=4-padded contraction runs at native MXU rate): the 2^(S·w) encoding
    is pure exponent-field arithmetic and bf16 has f32's 8-bit exponent;
    the one-hot matrices are 0/1; the widths are ints 1..8 (< 2^7 mantissa
    cap); accumulation stays f32 via preferred_element_type.
    """
    fpr = LANES // wpf
    spacing = (wpf - 1).bit_length() + 1           # 6 for wpf=32
    v = jax.lax.bitcast_convert_type((spacing * wq + 127) << 23,
                                     jnp.float32).astype(jnp.bfloat16)
    sel = (jax.lax.broadcasted_iota(jnp.int32, (LANES, fpr), 0) // wpf
           == jax.lax.broadcasted_iota(jnp.int32, (LANES, fpr), 1)
           ).astype(jnp.bfloat16)
    seg = jnp.dot(v, sel, preferred_element_type=jnp.float32)
    e = (jax.lax.bitcast_convert_type(seg, jnp.int32) >> 23) - 127
    b_fpr = e // spacing
    selT = (jax.lax.broadcasted_iota(jnp.int32, (fpr, LANES), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (fpr, LANES), 1) // wpf
            ).astype(jnp.bfloat16)
    b_lane = jnp.dot(b_fpr.astype(jnp.bfloat16), selT,
                     preferred_element_type=jnp.float32).astype(jnp.int32)
    return b_fpr, b_lane


def _encode_kernel(wpf: int, tile_r: int):
    """Input contract: bytes beyond the true length ``n`` are ZERO (every
    host wrapper zero-pads its staging buffer), so no per-word tail mask
    is needed — zero padding cannot inflate the last real frame's width,
    and pad frames' widths/fields are discarded on host.  Dropping the
    mask removes ~15 VPU ops/word; the masked kernel measured
    compute-bound at 257 GB/s vs a 455 GB/s copy ceiling (exp6).

    (An attempted widths-via-DMA variant — scratch → linear ANY output —
    does not compile: Mosaic cannot slice the (4,1)-packed u8 memref the
    minor-dim-fpr output gets even in ANY space.)"""
    del tile_r

    def kernel(w_ref, fields_ref, bits_ref):
        w = w_ref[...].astype(jnp.uint32)
        o = w | (w >> 8)
        o = (o | (o >> 16)) & jnp.uint32(0xFF)
        wq = _word_widths_f32exp(o)
        b_fpr, b_lane = _frame_widths_mxu(wq, wpf)
        bits_ref[...] = b_fpr.astype(jnp.uint8)

        # Spread via Horner multiply (m = 2^b): adds are exact ORs because
        # the contributions occupy disjoint bit ranges.
        m = jnp.uint32(1) << b_lane.astype(jnp.uint32)
        r = w >> 24
        r = r * m + ((w >> 16) & jnp.uint32(0xFF))
        r = r * m + ((w >> 8) & jnp.uint32(0xFF))
        fields_ref[...] = r * m + (w & jnp.uint32(0xFF))
    return kernel


def _decode_kernel(wpf: int):
    """Output contract: bytes beyond ``n`` are unspecified (callers slice
    ``[:n]`` on host) — no tail mask, same rationale as the encoder."""
    fpr = LANES // wpf

    def kernel(f_ref, bits_ref, out_ref):
        f = f_ref[...].astype(jnp.uint32)
        # Widths arrive compact (R, fpr); broadcast to lanes on the MXU
        # (a flat->padded reshape outside the kernel would be a
        # scalar-core relayout — FINDINGS.md).  bf16 operands are exact
        # for ints 1..8 / one-hot and measurably faster (exp17).
        # u8→i32→float (Mosaic has no direct u8→float cast on hardware)
        b4 = bits_ref[...].astype(jnp.int32).astype(jnp.bfloat16)
        selT = (jax.lax.broadcasted_iota(jnp.int32, (fpr, LANES), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (fpr, LANES), 1)
                // wpf).astype(jnp.bfloat16)
        b = jnp.dot(b4, selT,
                    preferred_element_type=jnp.float32).astype(
                        jnp.int32).astype(jnp.uint32)
        mask = (jnp.uint32(1) << b) - jnp.uint32(1)
        s1 = f >> b
        s2 = s1 >> b
        s3 = s2 >> b
        out_ref[...] = ((f & mask) | ((s1 & mask) << 8)
                        | ((s2 & mask) << 16) | ((s3 & mask) << 24))
    return kernel


def _supported(frame_length: int) -> bool:
    wpf = frame_length // 4
    return frame_length % 8 == 0 and wpf <= LANES and LANES % wpf == 0


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("frame_length", "tile_r"))
def fl_encode_fields_pallas(words: jax.Array, n: jax.Array,
                            frame_length: int = FRAME_LENGTH,
                            tile_r: int | None = None):
    """Pallas field encode.  ``words`` u32[NW], NW a tile multiple; bytes
    beyond ``n`` MUST be zero (all host wrappers zero-pad — the kernel
    carries no tail mask).

    Returns ``(bits2d u8[rows, 128/wpf], fields u32[NW])``.  ``bits2d``
    holds the per-frame widths in row-major frame order; it stays 2-D
    because every on-device flattening of a minor-dim<128 layout lowers to
    a scalar-core relayout (hundreds of ms — experiments/FINDINGS.md).
    Flatten on host: ``np.asarray(bits2d).reshape(-1)[:frames]``.
    """
    del n  # kept in the signature for API stability; see input contract
    tile_r = ENC_TILE_R if tile_r is None else tile_r
    wpf = frame_length // 4
    assert _supported(frame_length), frame_length
    nw = words.shape[0]
    assert nw % (tile_r * LANES) == 0, "pad to a tile multiple"
    grid = nw // (tile_r * LANES)
    fpr = LANES // wpf

    fields, bits2d = pl.pallas_call(
        _encode_kernel(wpf, tile_r),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, fpr), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nw // LANES, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((nw // LANES, fpr), jnp.uint8),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(words.reshape(nw // LANES, LANES))
    return bits2d, fields.reshape(-1)


@functools.partial(jax.jit, static_argnames=("frame_length", "tile_r"))
def fl_decode_fields_pallas(fields: jax.Array, bits2d: jax.Array,
                            n: jax.Array,
                            frame_length: int = FRAME_LENGTH,
                            tile_r: int | None = None) -> jax.Array:
    """Pallas field decode: fields u32[NW] + bits2d u8[rows, 128/wpf]
    (frame widths in row-major frame order — reshape flat host bits with
    NumPy, never on device) → words u32[NW].  Bytes beyond ``n`` in the
    output are unspecified (callers slice ``[:n]`` on host)."""
    del n  # see output contract
    tile_r = DEC_TILE_R if tile_r is None else tile_r
    wpf = frame_length // 4
    assert _supported(frame_length), frame_length
    nw = fields.shape[0]
    assert nw % (tile_r * LANES) == 0
    fpr = LANES // wpf
    assert bits2d.shape == (nw // LANES, fpr), bits2d.shape
    grid = nw // (tile_r * LANES)

    out = pl.pallas_call(
        _decode_kernel(wpf),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, fpr), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nw // LANES, LANES), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(fields.reshape(nw // LANES, LANES), bits2d)
    return out.reshape(-1)


def pad_words(n: int, bucket_words: int = TILE_WORDS) -> int:
    nw = max(1, -(-n // 4))
    return -(-nw // bucket_words) * bucket_words


# ---------------------------------------------------------------------------
# Pack-2 field variants (global max frame width <= 4)
# ---------------------------------------------------------------------------
#
# A width-b frame's field occupies 4·b bits, so when EVERY frame of the
# array has b <= 4 two field words fit one u32.  With the pack factor
# chosen globally the kernels stay fully static — no per-tile depth
# branches, switch dispatch or manual emit DMA (the per-tile dynamic
# packing those need was refuted in exp21/22/24) — and the encode→decode
# pair's HBM traffic drops from 4N to 3N bytes.  Chip A/B (exp29,
# interleaved): pair 352-368 GB/s credited vs 308-328 base, parity-exact.
#
# Layout (the tile is the layout unit — encoder and decoder of one array
# must use the same ``tile_r``): within each (tile_r, 128)-word tile of
# fields, ``packed[r] = f[r] | f[r + tile_r/2] << 16`` giving a
# (tile_r/2, 128) u32 block per tile.  Host unpack: view the packed array
# as (ntiles, tile_r/2, 128); lo 16 bits are tile rows [0, tile_r/2), hi
# bits rows [tile_r/2, tile_r).
#
# VALIDITY is the caller's contract: the encoder packs the low 16 bits of
# each field unconditionally, so a frame with width > 4 silently corrupts.
# Callers check ``bits.max() <= 4`` (the widths are produced by this same
# kernel, and the host always receives them) and fall back to the base
# kernels — the one speculative re-run costs a kernel pass, ~1% of the
# device→host transfer it would have halved.

PACK_TILE_R = _TILE_OVERRIDE or int(os.environ.get("FLRL_PACK_TILE_R",
                                                   "2048"))


def _encode_packed_kernel(wpf: int):
    """Base encode kernel + one shift/or of the tile halves.  Fields of
    width-<=4 frames are < 2^16, so no masking is needed; a width-5..8
    frame violates the caller contract (see module comment)."""

    def kernel(w_ref, packed_ref, bits_ref):
        R = w_ref.shape[0]
        w = w_ref[...].astype(jnp.uint32)
        o = w | (w >> 8)
        o = (o | (o >> 16)) & jnp.uint32(0xFF)
        wq = _word_widths_f32exp(o)
        b_fpr, b_lane = _frame_widths_mxu(wq, wpf)
        bits_ref[...] = b_fpr.astype(jnp.uint8)
        m = jnp.uint32(1) << b_lane.astype(jnp.uint32)
        r = w >> 24
        r = r * m + ((w >> 16) & jnp.uint32(0xFF))
        r = r * m + ((w >> 8) & jnp.uint32(0xFF))
        r = r * m + (w & jnp.uint32(0xFF))
        packed_ref[...] = r[:R // 2] | (r[R // 2:] << 16)
    return kernel


def _decode_packed_kernel(wpf: int):
    fpr = LANES // wpf

    def kernel(p_ref, bits_ref, out_ref):
        R = out_ref.shape[0]
        p = p_ref[...].astype(jnp.uint32)
        b4 = bits_ref[...].astype(jnp.int32).astype(jnp.bfloat16)
        selT = (jax.lax.broadcasted_iota(jnp.int32, (fpr, LANES), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (fpr, LANES), 1)
                // wpf).astype(jnp.bfloat16)
        b = jnp.dot(b4, selT, preferred_element_type=jnp.float32).astype(
            jnp.int32).astype(jnp.uint32)

        def dec4(f, bb):
            mask = (jnp.uint32(1) << bb) - jnp.uint32(1)
            s1 = f >> bb
            s2 = s1 >> bb
            s3 = s2 >> bb
            return ((f & mask) | ((s1 & mask) << 8)
                    | ((s2 & mask) << 16) | ((s3 & mask) << 24))

        out_ref[:R // 2] = dec4(p & jnp.uint32(0xFFFF), b[:R // 2])
        out_ref[R // 2:] = dec4(p >> 16, b[R // 2:])
    return kernel


@functools.partial(jax.jit, static_argnames=("frame_length", "tile_r"))
def fl_encode_fields_packed_pallas(words: jax.Array, n: jax.Array,
                                   frame_length: int = FRAME_LENGTH,
                                   tile_r: int | None = None):
    """Pack-2 field encode (see the layout/validity comment above).

    Same input contract as :func:`fl_encode_fields_pallas`; returns
    ``(bits2d u8[rows, 128/wpf], packed u32[NW/2])``.  The caller MUST
    verify ``bits.max() <= 4`` before trusting ``packed``."""
    del n
    tile_r = PACK_TILE_R if tile_r is None else tile_r
    wpf = frame_length // 4
    assert _supported(frame_length), frame_length
    assert tile_r % 16 == 0
    nw = words.shape[0]
    assert nw % (tile_r * LANES) == 0, "pad to a pack-tile multiple"
    grid = nw // (tile_r * LANES)
    fpr = LANES // wpf

    packed, bits2d = pl.pallas_call(
        _encode_packed_kernel(wpf),
        grid=(grid,),
        in_specs=[pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((tile_r // 2, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, fpr), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nw // LANES // 2, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((nw // LANES, fpr), jnp.uint8),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(words.reshape(nw // LANES, LANES))
    return bits2d, packed.reshape(-1)


@functools.partial(jax.jit, static_argnames=("frame_length", "tile_r"))
def fl_decode_fields_packed_pallas(packed: jax.Array, bits2d: jax.Array,
                                   n: jax.Array,
                                   frame_length: int = FRAME_LENGTH,
                                   tile_r: int | None = None) -> jax.Array:
    """Inverse of :func:`fl_encode_fields_packed_pallas` — MUST use the
    same ``tile_r`` (the tile is the layout unit)."""
    del n
    tile_r = PACK_TILE_R if tile_r is None else tile_r
    wpf = frame_length // 4
    assert _supported(frame_length), frame_length
    assert tile_r % 16 == 0
    nw = 2 * packed.shape[0]
    assert nw % (tile_r * LANES) == 0
    fpr = LANES // wpf
    assert bits2d.shape == (nw // LANES, fpr), bits2d.shape
    grid = nw // (tile_r * LANES)

    out = pl.pallas_call(
        _decode_packed_kernel(wpf),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile_r // 2, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, fpr), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nw // LANES, LANES), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(packed.reshape(nw // LANES // 2, LANES), bits2d)
    return out.reshape(-1)


def unpack_fields_p2(packed: np.ndarray, nw: int,
                     tile_r: int | None = None) -> np.ndarray:
    """Host unpack of the pack-2 layout → flat u32[nw] fields."""
    tile_r = PACK_TILE_R if tile_r is None else tile_r
    q = tile_r // 2
    p = np.asarray(packed).reshape(-1, q, LANES)
    out = np.empty((p.shape[0], tile_r, LANES), np.uint32)
    out[:, :q] = p & 0xFFFF
    out[:, q:] = p >> 16
    return out.reshape(-1)[:nw]
