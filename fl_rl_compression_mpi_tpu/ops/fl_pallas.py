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

from .bitpack import FRAME_LENGTH, MAX_WIDTH

import os

TILE_R = int(os.environ.get("FLRL_TILE_R", "2048"))  # sublane rows per tile
LANES = 128
TILE_WORDS = TILE_R * LANES       # default 1 MiB per buffer


def _lane_in_seg(wpf: int):
    lane = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, LANES), 1)
    return lane % wpf


def _seg_or_broadcast(o: jax.Array, wpf: int) -> jax.Array:
    """Per-``wpf``-lane-segment OR of ``o``, broadcast to every lane of the
    segment.  Two log-phases of lane rolls, masked at segment boundaries.
    """
    lin = _lane_in_seg(wpf)
    # Phase 1: suffix-OR — lane l accumulates OR of [l, seg_end).
    m = o
    k = 1
    while k < wpf:
        rolled = pltpu.roll(m, LANES - k, 1)   # == roll by -k (circular)
        m = jnp.where(lin + k < wpf, m | rolled, m)
        k *= 2
    # Now segment-start lanes hold the full segment OR.
    s = jnp.where(lin == 0, m, 0)
    # Phase 2: prefix-OR spread of the start value to the whole segment.
    k = 1
    while k < wpf:
        rolled = pltpu.roll(s, k, 1)
        s = jnp.where(lin >= k, s | rolled, s)
        k *= 2
    return s


def _required_bits(v: jax.Array) -> jax.Array:
    acc = jnp.zeros_like(v)
    for k in range(MAX_WIDTH):
        acc = acc + (v >= (1 << k)).astype(v.dtype)
    return jnp.maximum(acc, 1)


def _tail_mask(n: jax.Array, base: jax.Array) -> jax.Array:
    """u32 byte-validity mask for the tile's words (word index base+iota)."""
    widx = base + jax.lax.broadcasted_iota(jnp.int32, (TILE_R, LANES), 0) \
        * LANES + jax.lax.broadcasted_iota(jnp.int32, (TILE_R, LANES), 1)
    rem = jnp.clip(n - widx * 4, 0, 4)
    m = jnp.zeros((TILE_R, LANES), jnp.uint32)
    for k, mk in ((1, 0xFF), (2, 0xFFFF), (3, 0xFFFFFF), (4, 0xFFFFFFFF)):
        m = jnp.where(rem == k, jnp.uint32(mk), m)
    return m


def _encode_kernel(wpf: int):
    fpr = LANES // wpf               # frames per 128-lane row

    def kernel(n_ref, w_ref, fields_ref, bits_ref):
        i = pl.program_id(0)
        n = n_ref[0, 0]
        w = w_ref[...].astype(jnp.uint32)
        w = w & _tail_mask(n, i * TILE_WORDS)

        o = w | (w >> 8)
        o = (o | (o >> 16)) & jnp.uint32(0xFF)
        seg = _seg_or_broadcast(o.astype(jnp.int32), wpf)
        b = _required_bits(seg)

        e1 = (w >> 8) & jnp.uint32(0xFF)
        e2 = (w >> 16) & jnp.uint32(0xFF)
        e3 = w >> 24
        bu = b.astype(jnp.uint32)
        fields_ref[...] = ((w & jnp.uint32(0xFF)) | (e1 << bu)
                           | (e2 << (2 * bu)) | (e3 << (3 * bu)))
        # Per-frame width extraction: strided lane selection is unsupported
        # / scalar-slow, but a one-hot selection matmul rides the MXU for
        # free (picks lane j*wpf of each row into column j).
        sel = (jax.lax.broadcasted_iota(jnp.int32, (LANES, fpr), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (LANES, fpr), 1)
               * wpf).astype(jnp.float32)
        bc = jnp.dot(b.astype(jnp.float32), sel,
                     preferred_element_type=jnp.float32)
        bits_ref[...] = bc.astype(jnp.int32).astype(jnp.uint8)
    return kernel


def _decode_kernel(wpf: int):
    def kernel(n_ref, f_ref, bw_ref, out_ref):
        i = pl.program_id(0)
        n = n_ref[0, 0]
        f = f_ref[...].astype(jnp.uint32)
        b = bw_ref[...].astype(jnp.uint32)
        mask = (jnp.uint32(1) << b) - jnp.uint32(1)
        w = ((f & mask) | (((f >> b) & mask) << 8)
             | (((f >> (2 * b)) & mask) << 16)
             | (((f >> (3 * b)) & mask) << 24))
        out_ref[...] = w & _tail_mask(n, i * TILE_WORDS)
    return kernel


def _supported(frame_length: int) -> bool:
    wpf = frame_length // 4
    return frame_length % 8 == 0 and wpf <= LANES and LANES % wpf == 0


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("frame_length",))
def fl_encode_fields_pallas(words: jax.Array, n: jax.Array,
                            frame_length: int = FRAME_LENGTH):
    """Pallas field encode.  ``words`` u32[NW], NW a tile multiple.

    Returns ``(bits2d u8[rows, 128/wpf], fields u32[NW])``.  ``bits2d``
    holds the per-frame widths in row-major frame order; it stays 2-D
    because every on-device flattening of a minor-dim<128 layout lowers to
    a scalar-core relayout (hundreds of ms — experiments/FINDINGS.md).
    Flatten on host: ``np.asarray(bits2d).reshape(-1)[:frames]``.
    """
    wpf = frame_length // 4
    assert _supported(frame_length), frame_length
    nw = words.shape[0]
    assert nw % TILE_WORDS == 0, "pad to a tile multiple"
    grid = nw // TILE_WORDS
    fpr = LANES // wpf
    n2 = jnp.asarray(n, jnp.int32).reshape(1, 1)

    fields, bits2d = pl.pallas_call(
        _encode_kernel(wpf),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_R, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_R, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, fpr), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nw // LANES, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((nw // LANES, fpr), jnp.uint8),
        ],
        interpret=_interpret(),
    )(n2, words.reshape(nw // LANES, LANES))
    return bits2d, fields.reshape(-1)


@functools.partial(jax.jit, static_argnames=("frame_length",))
def fl_decode_fields_pallas(fields: jax.Array, bits: jax.Array, n: jax.Array,
                            frame_length: int = FRAME_LENGTH) -> jax.Array:
    """Pallas field decode: fields u32[NW] + bits u8[F] → words u32[NW]."""
    wpf = frame_length // 4
    assert _supported(frame_length), frame_length
    nw = fields.shape[0]
    assert nw % TILE_WORDS == 0
    assert bits.shape[0] * wpf == nw
    grid = nw // TILE_WORDS
    n2 = jnp.asarray(n, jnp.int32).reshape(1, 1)

    # Per-word width broadcast (one XLA pass; the kernel reads it as u8 —
    # a quarter of the field traffic).
    bw = jnp.broadcast_to(bits[:, None], (bits.shape[0], wpf)).reshape(
        nw // LANES, LANES)

    out = pl.pallas_call(
        _decode_kernel(wpf),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_R, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_R, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nw // LANES, LANES), jnp.uint32),
        interpret=_interpret(),
    )(n2, fields.reshape(nw // LANES, LANES), bw)
    return out.reshape(-1)


def pad_words(n: int, bucket_words: int = TILE_WORDS) -> int:
    nw = max(1, -(-n // 4))
    return -(-nw // bucket_words) * bucket_words
