"""Ragged array primitives shared by the codec and distributed layers.

The whole framework runs under XLA's static-shape regime, so "ragged" data
(per-frame packed bytes, per-shard compressed payloads) lives in worst-case
padded buffers with a scalar true length.  Concatenating / compacting such
buffers is everywhere — frame placement inside a chip, rank-ordered shard
merge across chips (the reference's ``MergeFLCompressed``,
``/root/reference/src/fl/fl_common.cuh:95-151``, and the padded-AllGather
compaction of ``fl_gpu.cu:217-241``).  One scan-based primitive covers it:
mark row starts, inclusive-scan to a row id per output slot, flat gather.
No atomics and no data-dependent shapes, so it compiles once and runs on the
VPU at memory bandwidth.
"""

from __future__ import annotations

import jax.numpy as jnp


def ragged_concat_rows(rows: jnp.ndarray, lens: jnp.ndarray,
                       out_pad: int | None = None):
    """Concatenate the valid prefixes of a padded row matrix.

    ``rows`` is ``(R, W)``; row ``r`` holds ``lens[r]`` valid leading
    elements.  Returns ``(out, total)`` where ``out`` is 1-D of static size
    ``out_pad`` (default ``R*W``) whose first ``total = sum(lens)`` elements
    are ``rows[0][:lens[0]] ‖ rows[1][:lens[1]] ‖ …`` and the rest are 0.
    """
    nrows, width = rows.shape
    if out_pad is None:
        out_pad = nrows * width
    lens = lens.astype(jnp.int32)
    offs = jnp.cumsum(lens) - lens                     # exclusive scan
    total = offs[-1] + lens[-1] if nrows else jnp.int32(0)

    mark = (jnp.zeros(out_pad, jnp.int32)
            .at[jnp.where(lens > 0, offs, out_pad)].add(1, mode="drop"))
    rid = jnp.clip(jnp.cumsum(mark) - 1, 0, nrows - 1)
    idx = jnp.arange(out_pad, dtype=jnp.int32)
    local = idx - offs[rid]
    out = rows.reshape(-1)[rid * width + local]
    out = jnp.where(idx < total, out, 0).astype(rows.dtype)
    return out, total
