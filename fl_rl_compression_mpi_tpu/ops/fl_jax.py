"""TPU-native FL (fixed-length) codec in JAX.

This is the device formulation of the codec whose semantics are specified by
the golden NumPy implementation (`fl_numpy.py`) and, transitively, by the
reference CPU codec (``/root/reference/src/fl/fl_cpu.cu``).  Nothing here is a
translation of the reference CUDA kernels (``fl_gpu.cu:648-755``): the
thread-per-byte + sub-word-atomic style is anti-idiomatic on TPU, so the
algorithm is re-expressed as fixed-shape, branch-free vector ops that XLA can
tile onto the VPU:

* per-frame bit-widths: reshape ``(F, L)`` + ``max`` over the lane axis — the
  segmented max replaces the reference's shared-memory ``atomicMaxUint8t``
  tree (``fl_gpu.cu:648-685``);
* packing: for each of the 8 possible widths the pack is a *static*
  gather/shift/OR pattern (`bitpack.pack_tables`), so all 8 variants are
  computed branch-free and selected per frame — no two writers ever share an
  output byte, so the reference's ``atomicOrUint8t`` disappears by
  construction;
* frame placement: exclusive ``cumsum`` of per-frame byte counts (the
  reference uses ``thrust::exclusive_scan``, ``fl_gpu.cu:805-808``) followed
  by a mark/cumsum frame-id assignment and a flat gather — a scatter-free
  ragged compaction;
* decode: per output byte, a two-byte masked gather of the packed stream —
  the vectorized form of ``decompressCalculateOutput`` (``fl_gpu.cu:728-755``).

Shapes are static (XLA compiles once per padded-size bucket); the true input
length ``n`` is a traced scalar so arbitrary file sizes reuse one executable.
All index math is int32 on device: a single shard is capped at 2 GiB, which
also side-steps the reference's ``int`` overflow defect (``file_io.cu:46-51``)
rather than replicating it — multi-chip sharding keeps per-shard sizes small.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .bitpack import FRAME_LENGTH, MAX_WIDTH, pack_tables
from .ragged import ragged_concat_rows


class FLEncoded(NamedTuple):
    """Device-side encode result with worst-case static shapes.

    ``bits``/``values`` carry valid data only in their first ``num_frames`` /
    ``values_size`` entries; callers slice after device→host transfer (the
    reference computes the true size first and allocates exactly,
    ``fl_gpu.cu:353-361`` — under XLA we allocate worst case and slice late).
    """
    bits: jax.Array         # u8[F_pad]
    values: jax.Array       # u8[N_pad]
    num_frames: jax.Array   # i32 scalar — ceil(n / L)
    values_size: jax.Array  # i32 scalar — exact packed byte count


def _frame_counts(n: jax.Array, num_frames_pad: int, frame_length: int):
    """Per-frame valid element counts for dynamic length ``n`` (0 for frames
    entirely beyond the input)."""
    f = jnp.arange(num_frames_pad, dtype=jnp.int32)
    return jnp.clip(n - f * frame_length, 0, frame_length)


def _required_bits(frame_max: jax.Array) -> jax.Array:
    """``max(1, 8 - clz(v))`` per frame, branch-free (floor of 1 for zero
    frames as in the reference, ``fl_cpu.cu:39-47``)."""
    acc = jnp.zeros_like(frame_max)
    for k in range(MAX_WIDTH):
        acc = acc + (frame_max >= (1 << k)).astype(frame_max.dtype)
    return jnp.maximum(acc, 1)


@functools.partial(jax.jit, static_argnames=("frame_length",))
def fl_encode(data: jax.Array, n: jax.Array,
              frame_length: int = FRAME_LENGTH) -> FLEncoded:
    """Encode ``data[:n]``; ``data`` is u8 with static size divisible by
    ``frame_length``.  Bytes at index ≥ n may hold arbitrary junk."""
    npad = data.shape[0]
    assert npad % frame_length == 0, "pad input to a frame multiple"
    num_frames_pad = npad // frame_length
    n = n.astype(jnp.int32)

    idx = jnp.arange(npad, dtype=jnp.int32)
    data = jnp.where(idx < n, data, 0).astype(jnp.uint8)
    frames = data.reshape(num_frames_pad, frame_length).astype(jnp.int32)

    counts = _frame_counts(n, num_frames_pad, frame_length)
    bits = _required_bits(frames.max(axis=1))

    # Branch-free 8-variant pack into worst-case (F, L) byte rows.
    row_bytes = frame_length  # width-8 frames pack 1:1
    padded = jnp.zeros((num_frames_pad, row_bytes), jnp.int32)
    tables = pack_tables(frame_length)
    for b in range(1, MAX_WIDTH + 1):
        tidx, ls, rs, valid, nbytes = tables[b]
        g = frames[:, tidx]                       # (F, nbytes, T) static gather
        v = jnp.where(valid[None], (g << ls[None]) >> rs[None], 0)
        packed = jnp.bitwise_or.reduce(v, axis=2) & 0xFF
        if nbytes < row_bytes:
            packed = jnp.pad(packed, ((0, 0), (0, row_bytes - nbytes)))
        padded = jnp.where((bits == b)[:, None], packed, padded)

    # Frame placement: exclusive scan of per-frame byte counts, then the
    # shared scan-based ragged compaction (no atomics, static shapes).
    nb = (counts * bits + 7) // 8                  # 0 for empty frames
    values, values_size = ragged_concat_rows(padded, nb, out_pad=npad)
    values = values.astype(jnp.uint8)

    num_frames = (n + frame_length - 1) // frame_length
    return FLEncoded(bits=bits.astype(jnp.uint8), values=values,
                     num_frames=num_frames, values_size=values_size)


@functools.partial(jax.jit, static_argnames=("frame_length",))
def fl_decode(bits: jax.Array, values: jax.Array, n: jax.Array,
              frame_length: int = FRAME_LENGTH) -> jax.Array:
    """Decode to ``n`` bytes (u8[N_pad], valid prefix ``n``).

    ``bits`` is u8[F_pad] (junk beyond the true frame count), ``values`` is
    u8[N_pad] (worst-case buffer, junk beyond the packed size).
    """
    npad = values.shape[0]
    num_frames_pad = bits.shape[0]
    assert npad == num_frames_pad * frame_length
    n = n.astype(jnp.int32)

    counts = _frame_counts(n, num_frames_pad, frame_length)
    b = jnp.where(counts > 0, bits.astype(jnp.int32), 0)
    nb = (counts * b + 7) // 8
    offsets = jnp.cumsum(nb) - nb

    # Per output byte: frame f = o // L, element i = o % L (static pattern);
    # bit position within the frame stream = i * b, so the two-byte masked
    # read has closed-form indices — no table needed on device.
    i_in_frame = jnp.arange(frame_length, dtype=jnp.int32)[None, :]
    bitpos = i_in_frame * b[:, None]                     # (F, L)
    byte_idx = offsets[:, None] + (bitpos >> 3)          # (F, L)
    bit_off = bitpos & 7

    v32 = values.astype(jnp.int32)
    flat_byte = jnp.clip(byte_idx.reshape(-1), 0, npad - 1)
    flat_next = jnp.clip(byte_idx.reshape(-1) + 1, 0, npad - 1)
    lo = v32[flat_byte].reshape(num_frames_pad, frame_length) >> bit_off
    hi = v32[flat_next].reshape(num_frames_pad, frame_length) << (8 - bit_off)
    mask = (1 << b[:, None]) - 1
    out = ((lo | hi) & mask).reshape(-1)

    idx = jnp.arange(npad, dtype=jnp.int32)
    return jnp.where(idx < n, out, 0).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Host-facing convenience wrappers (pad → device → slice).
# ---------------------------------------------------------------------------

def pad_to_frames(n: int, frame_length: int = FRAME_LENGTH,
                  bucket: int = 1) -> int:
    """Static padded size for an ``n``-byte input: a frame multiple, rounded
    up to ``bucket`` frames so many sizes share one compiled executable."""
    frames = max(1, -(-n // frame_length))
    frames = -(-frames // bucket) * bucket
    return frames * frame_length


def encode(data: np.ndarray, frame_length: int = FRAME_LENGTH,
           bucket_frames: int = 8192):
    """NumPy in → (bits u8[F], values u8[V]) out, exact sizes (host API that
    mirrors `fl_numpy.encode`)."""
    data = np.asarray(data, np.uint8)
    n = data.size
    if n == 0:
        return np.zeros(0, np.uint8), np.zeros(0, np.uint8)
    npad = pad_to_frames(n, frame_length, bucket_frames)
    buf = np.zeros(npad, np.uint8)
    buf[:n] = data
    enc = fl_encode(jnp.asarray(buf), jnp.int32(n), frame_length=frame_length)
    enc = jax.device_get(enc)
    return (np.asarray(enc.bits[: int(enc.num_frames)]),
            np.asarray(enc.values[: int(enc.values_size)]))


def decode(output_size: int, bits: np.ndarray, values: np.ndarray,
           frame_length: int = FRAME_LENGTH,
           bucket_frames: int = 8192) -> np.ndarray:
    """NumPy in → decoded u8[output_size] (host API mirroring
    `fl_numpy.decode`)."""
    bits = np.asarray(bits, np.uint8)
    values = np.asarray(values, np.uint8)
    if bits.size == 0 or values.size == 0:
        return np.zeros(0, np.uint8)
    npad = pad_to_frames(output_size, frame_length, bucket_frames)
    fpad = npad // frame_length
    bbuf = np.zeros(fpad, np.uint8)
    bbuf[: bits.size] = bits
    vbuf = np.zeros(npad, np.uint8)
    vbuf[: values.size] = values
    out = fl_decode(jnp.asarray(bbuf), jnp.asarray(vbuf),
                    jnp.int32(output_size), frame_length=frame_length)
    return np.asarray(jax.device_get(out))[:output_size]
