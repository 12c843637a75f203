"""TPU-native FL (fixed-length) codec in JAX.

This is the device formulation of the codec whose semantics are specified by
the golden NumPy implementation (`fl_numpy.py`) and, transitively, by the
reference CPU codec (``/root/reference/src/fl/fl_cpu.cu``).  Nothing here is a
translation of the reference CUDA kernels (``fl_gpu.cu:648-755``): the
thread-per-byte + sub-word-atomic style is anti-idiomatic on TPU, so the
algorithm is re-expressed as fixed-shape, branch-free vector ops that XLA
tiles onto the VPU:

* per-frame bit-widths: reshape ``(F, L)`` + ``max`` over the lane axis — the
  segmented max replaces the reference's shared-memory ``atomicMaxUint8t``
  tree (``fl_gpu.cu:648-685``);
* packing: key invariant — 8 consecutive elements at width ``b`` pack to
  exactly ``b`` bytes, so a frame is ``L/8`` *groups* of 8 elements, each
  producing ``b`` contiguous output bytes.  For each of the 8 possible
  widths the group pack is a **purely elementwise** shift/mask/add over
  strided reshapes (every packed byte is a sum of disjoint-bit
  contributions, so OR == ADD and no two writers share a byte — the
  reference's ``atomicOrUint8t`` disappears by construction).  All 8
  variants are computed branch-free and selected per frame;
* placement: a full frame packs to ``b`` *units* of ``L/8`` bytes, so the
  dense stream is a unit-granular ragged scatter — ``cumsum`` of per-frame
  unit counts (the reference uses ``thrust::exclusive_scan``,
  ``fl_gpu.cu:805-808``) + one row-scatter of ``L/8``-byte units, moving
  16 bytes per index instead of 1;
* decode: the exact inverse — unit-granular row gather, then the
  elementwise per-variant unpack (the vectorized form of
  ``decompressCalculateOutput``, ``fl_gpu.cu:728-755``).

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

from .bitpack import FRAME_LENGTH, MAX_WIDTH


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


def _pack_variant(groups: jax.Array, b: int) -> jax.Array:
    """Pack ``(F, G, 8)`` int32 element groups at fixed width ``b`` into
    ``(F, G, b)`` bytes — elementwise only (shifts + adds of disjoint bits).

    Element ``t`` of a group occupies bits ``[t*b, (t+1)*b)`` of the group's
    ``8b``-bit chunk; its contribution to chunk byte ``r`` is the shifted
    window overlapping ``[8r, 8r+8)`` — the same LSB-first layout as the
    reference pack loop (``fl_cpu.cu:62-84``) without its running offset.
    """
    F, G, _ = groups.shape
    out = [None] * b
    for t in range(8):
        lo_bit = t * b
        r1, s1 = lo_bit // 8, lo_bit % 8
        e = groups[:, :, t]
        contrib = (e << s1) & 0xFF
        out[r1] = contrib if out[r1] is None else out[r1] + contrib
        r2 = (lo_bit + b - 1) // 8
        if r2 != r1 and r2 < b:
            spill = e >> (8 - s1)
            out[r2] = spill if out[r2] is None else out[r2] + spill
    return jnp.stack(out, axis=2)


def _unpack_variant(packed: jax.Array, b: int) -> jax.Array:
    """Inverse of :func:`_pack_variant`: ``(F, G, b)`` bytes → ``(F, G, 8)``
    int32 elements (two-byte masked read with static indices per width —
    the branchless form of ``fl_cpu.cu:126-136``)."""
    mask = (1 << b) - 1
    elems = []
    for t in range(8):
        lo_bit = t * b
        r1, s1 = lo_bit // 8, lo_bit % 8
        v = packed[:, :, r1] >> s1
        r2 = (lo_bit + b - 1) // 8
        if r2 != r1 and r2 < b:
            v = v | (packed[:, :, r2] << (8 - s1))
        elems.append(v & mask)
    return jnp.stack(elems, axis=2)


@functools.partial(jax.jit, static_argnames=("frame_length",))
def fl_encode(data: jax.Array, n: jax.Array,
              frame_length: int = FRAME_LENGTH) -> FLEncoded:
    """Encode ``data[:n]``; ``data`` is u8 with static size divisible by
    ``frame_length``.  Bytes at index ≥ n may hold arbitrary junk."""
    npad = data.shape[0]
    L = frame_length
    assert npad % L == 0, "pad input to a frame multiple"
    assert L % 8 == 0
    G = L // 8                 # groups per frame == unit size in bytes
    num_frames_pad = npad // L
    n = n.astype(jnp.int32)

    idx = jnp.arange(npad, dtype=jnp.int32)
    data = jnp.where(idx < n, data, 0).astype(jnp.uint8)
    frames = data.reshape(num_frames_pad, L).astype(jnp.int32)

    counts = _frame_counts(n, num_frames_pad, L)
    bits = _required_bits(frames.max(axis=1))

    # Branch-free 8-variant elementwise pack.  A frame's stream is its
    # groups' chunks back to back (group-major): (G, b) bytes == b units of
    # G contiguous stream bytes, so the per-variant reshape (F, G, b) →
    # (F, b, G) is pure data movement — no transpose, no gather.
    groups = frames.reshape(num_frames_pad, G, 8)
    units = jnp.zeros((num_frames_pad, 8, G), jnp.int32)
    for b in range(1, MAX_WIDTH + 1):
        pk = _pack_variant(groups, b)                      # (F, G, b)
        pku = pk.reshape(num_frames_pad, b, G)             # b units of G
        pku = jnp.pad(pku, ((0, 0), (0, 8 - b), (0, 0)))
        units = jnp.where((bits == b)[:, None, None], pku, units)

    nb = (counts * bits + 7) // 8                          # bytes per frame
    ub = (nb + G - 1) // G                                 # units per frame
    offu = jnp.cumsum(ub) - ub                             # exclusive
    values_size = (jnp.cumsum(nb)[-1]).astype(jnp.int32)

    # Unit-granular ragged scatter (unique indices, no atomics).
    units_pad = npad // G + 1
    u_ix = jnp.arange(8, dtype=jnp.int32)[None, :]
    tgt = jnp.where(u_ix < ub[:, None], offu[:, None] + u_ix, units_pad)
    stream = (jnp.zeros((units_pad, G), jnp.int32)
              .at[tgt].set(units, mode="drop"))
    values = stream.reshape(-1)[:npad]
    values = jnp.where(idx < values_size, values, 0).astype(jnp.uint8)

    num_frames = (n + L - 1) // L
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
    L = frame_length
    G = L // 8
    num_frames_pad = bits.shape[0]
    assert npad == num_frames_pad * L
    n = n.astype(jnp.int32)

    counts = _frame_counts(n, num_frames_pad, L)
    b_arr = jnp.where(counts > 0, bits.astype(jnp.int32), 0)
    nb = (counts * b_arr + 7) // 8
    ub = (nb + G - 1) // G
    offu = jnp.cumsum(ub) - ub

    # Unit-granular ragged gather: frame f's packed bytes as (8, G) units
    # (junk rows for u >= ub masked to 0).
    units_pad = npad // G
    stream = values.reshape(units_pad, G).astype(jnp.int32)
    u_ix = jnp.arange(8, dtype=jnp.int32)[None, :]
    src = jnp.clip(offu[:, None] + u_ix, 0, units_pad - 1)
    units = stream[src]                                    # (F, 8, G)
    units = jnp.where((u_ix < ub[:, None])[:, :, None], units, 0)

    out = jnp.zeros((num_frames_pad, G, 8), jnp.int32)
    for b in range(1, MAX_WIDTH + 1):
        # First b units hold the frame's 16·b stream bytes; reshape back to
        # the (G, b) group-major chunk layout (inverse of the encode side).
        chunk_b = units[:, :b, :].reshape(num_frames_pad, G, b)
        el = _unpack_variant(chunk_b, b)                   # (F, G, 8)
        out = jnp.where((b_arr == b)[:, None, None], el, out)

    out = out.reshape(-1)
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
