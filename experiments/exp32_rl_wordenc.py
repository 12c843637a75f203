"""exp32 — word-granular RL encode (v2 candidate).

The production encode (rl_pallas._encode_kernel) pays three full-size
(R,128)-byte costs per tile: a 15-round prefix-max, a 15-round
prefix-sum, and a 15-bit LSB compaction network (~120 vec ops).  This
reformulation moves everything to the u32 WORD view (quarter size):

  planes     p_j = (word >> 8j) & 0xFF                (elementwise)
  flags      s_j per plane; word key = last flagged plane's residue
  lsmod      ONE quarter-size prefix-max over words (exclusive) +
             in-word select chains
  counts     c[w] = pieces in word (0..4); ONE quarter-size prefix-sum
             of the PACKED value (c<<14 | (c>0)) yields both the piece
             cumsum e and the live-word rank t
  compact    route words-with-pieces (not pieces): 13-bit network on
             (R/4,128), payload16 = flags | (w & 63) << 4, pay = word
  expand     BUCKETED piece-space expansion: live word at rank t goes up
             to piece slot e_excl(t) (dist = e-t, monotone); buckets
             sized by the tile's piece count K (typical tiles: 8 rows,
             not 256) — incompressible tiles fall back to the full
             bucket
  fill       holes ≤ 3 slots from their anchor (c ≤ 4): 2-round log
             fill with explicit liveness
  payload    j = (d+1)-th set flag bit; value = byte j of the filled
             word; start8 = (base + 4*(w&63)... + j) & 0xFF

Output contract is IDENTICAL to the production encode (packed starts
stream + total), so rl_split_packed / rl_decode_packed_pallas consume it
unchanged.

Run CPU parity: env PYTHONPATH=/root/repo python experiments/exp32_rl_wordenc.py
Run chip A/B:   timeout 1700 python experiments/exp32_rl_wordenc.py --chip
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fl_rl_compression_mpi_tpu.ops import lanes, rl_numpy, rl_pallas
from fl_rl_compression_mpi_tpu.ops.lanes import (LANES, flat_idx,
                                                 flat_shift_up)

_I32MAX = 2 ** 31 - 1


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _mod255_16(x):
    """x mod 255 for 0 <= x < 2**16 (two byte folds)."""
    s = (x & 255) + (x >> 8)
    s = (s & 255) + (s >> 8)
    return jnp.where(s >= 255, s - 255, s)


def _PIECE_BUCKETS(Rw: int):
    """Piece-space bucket rows for an Rw-word-row tile (piece capacity
    4*Rw*128).  Mirrors rl_pallas._EMIT_BUCKETS' 4x ladder."""
    cap = 4 * Rw
    out = []
    b = 8
    while b < cap:
        out.append(b)
        b *= 4
    return out + [cap]


def _encode_kernel_v2(Rw: int, grid: int, buckets=None):
    R = 4 * Rw                      # byte rows (emit layout)
    nbits_c = (Rw * LANES - 1).bit_length()   # word-compaction network
    PB = _PIECE_BUCKETS(Rw) if buckets is None else list(buckets)

    def kernel(n_ref, x_ref, out_ref, total_ref,
               carry, carry_row, merged, sem):
        i = pl.program_id(0)
        n = n_ref[0]

        @pl.when(i == 0)
        def _():
            carry[0] = -1          # previous byte (sentinel)
            carry[1] = 0           # (byte gidx mod 255) of last run start
            carry[2] = 0           # emitted-piece cursor
            carry_row[...] = jnp.zeros((1, LANES), jnp.int32)

        x = x_ref[...]
        p0 = (x & jnp.uint32(0xFF)).astype(jnp.int32)
        p1 = ((x >> 8) & jnp.uint32(0xFF)).astype(jnp.int32)
        p2 = ((x >> 16) & jnp.uint32(0xFF)).astype(jnp.int32)
        p3 = (x >> 24).astype(jnp.int32)

        wf = flat_idx(Rw)
        base_b = i * (R * LANES)               # byte base of this tile

        # run-start flags per plane
        prev3 = lanes.flat_shift_up(p3, 1, 0)
        prev3 = jnp.where(wf == 0, carry[0], prev3)
        s0 = p0 != prev3
        s1 = p1 != p0
        s2 = p2 != p1
        s3 = p3 != p2

        # byte-index residues mod 255 per plane
        bm255 = _mod255_16((base_b & 0xFFFF) + (base_b >> 16))
        g0 = _mod255_16((wf << 2) + bm255)
        g1 = jnp.where(g0 >= 254, g0 - 254, g0 + 1)
        g2 = jnp.where(g1 >= 254, g1 - 254, g1 + 1)
        g3 = jnp.where(g2 >= 254, g2 - 254, g2 + 1)

        # residue of the last run start STRICTLY BEFORE each word: one
        # exclusive quarter-size prefix-max of (wf<<8 | last-flag residue)
        kres = jnp.where(s3, g3, jnp.where(s2, g2, jnp.where(s1, g1, g0)))
        key = jnp.where(s0 | s1 | s2 | s3, (wf << 8) | kres, -1)
        r = lanes.prefix_max_flat(lanes.flat_shift_up(key, 1, -1))
        prevres = jnp.where(r >= 0, r & 255, carry[1])

        # per-plane last-start residue (inclusive) via in-word chains
        ls0 = jnp.where(s0, g0, prevres)
        ls1 = jnp.where(s1, g1, ls0)
        ls2 = jnp.where(s2, g2, ls1)
        ls3 = jnp.where(s3, g3, ls2)

        # piece flags (natural starts + a boundary every 255 in-run)
        gb0 = base_b + (wf << 2)
        k0 = (s0 | (g0 == ls0)) & (gb0 < n)
        k1 = (s1 | (g1 == ls1)) & (gb0 + 1 < n)
        k2 = (s2 | (g2 == ls2)) & (gb0 + 2 < n)
        k3 = (s3 | (g3 == ls3)) & (gb0 + 3 < n)

        flags = (k0.astype(jnp.int32) | (k1.astype(jnp.int32) << 1)
                 | (k2.astype(jnp.int32) << 2) | (k3.astype(jnp.int32) << 3))
        c = (k0.astype(jnp.int32) + k1.astype(jnp.int32)
             + k2.astype(jnp.int32) + k3.astype(jnp.int32))

        # ONE packed quarter-size prefix-sum: piece cumsum (bits 14+) and
        # live-word rank (bits 0..13) — sums stay separable (c-sum < 2^16
        # at bit 14 < 2^31; rank < 2^14)
        live_w = c > 0
        incl = lanes.prefix_sum_flat((c << 14) | live_w.astype(jnp.int32))
        K = incl[Rw - 1, LANES - 1] >> 14
        t_incl = incl & jnp.int32(0x3FFF)

        # compact words-with-pieces: payload16 = flags | (w mod 64) << 4
        # (start8 needs only 4*(w mod 64)); pay = the u32 word itself
        ctrl = lanes.pack_route(live_w, wf - (t_incl - 1),
                                flags | ((wf & 63) << 4))
        ctrl, pay = lanes.compact_lsb2(ctrl, x, nbits_c)

        # bucketed piece-space expansion + payload build + cursor merge:
        # ONLY the selected bucket's region executes per tile — typical
        # compressible tiles run the 8-row pipeline, not the 256-row one
        cc = carry[2] % LANES
        out_row = carry[2] // LANES
        bm256 = base_b & 255
        rows_used = jnp.maximum((cc + K + LANES - 1) // LANES, 1)

        pk = jnp.int32(0)
        for Bk in PB[:-1]:
            pk = pk + (K > Bk * LANES).astype(jnp.int32)

        # the previous tile's emit DMA reads `merged`: await it before
        # any bucket branch overwrites the buffer
        @pl.when(i > 0)
        def _():
            for bi, Bk in enumerate(rl_pallas._EMIT_BUCKETS(R)):
                @pl.when(carry[3] == bi)
                def _(Bk=Bk):
                    pltpu.make_async_copy(
                        merged.at[:Bk], out_ref.at[pl.ds(out_row, Bk)],
                        sem).wait()

        for bi, B in enumerate(PB):
            @pl.when(pk == bi)
            def _(B=B):
                if B <= Rw:
                    cB, pB = ctrl[:B], pay[:B]
                else:
                    cB = jnp.concatenate(
                        [ctrl, jnp.zeros((B - Rw, LANES), jnp.int32)],
                        axis=0)
                    pB = jnp.concatenate(
                        [pay, jnp.zeros((B - Rw, LANES), jnp.uint32)],
                        axis=0)
                # piece-slot targets: e_excl from the bucket-local cumsum
                # of per-slot piece counts; dist = e - t <= 3(K-1)/4
                fl = cB & jnp.int32(0xF)
                cb = ((fl & 1) + ((fl >> 1) & 1) + ((fl >> 2) & 1)
                      + ((fl >> 3) & 1))
                e_incl = lanes.prefix_sum_flat(jnp.where(cB < 0, cb, 0))
                tB = flat_idx(B)
                dist = (e_incl - cb) - tB
                ctrl2 = jnp.where(
                    cB < 0,
                    jnp.int32(lanes.LIVE) | (dist << lanes.DIST_SHIFT)
                    | (cB & jnp.int32(0xFFFF)),
                    jnp.int32(0))
                nbits_e = min(15, (3 * (B * LANES - 1) // 4).bit_length())
                ec, ep = lanes.expand_msb2(ctrl2, pB, nbits_e)

                # log fill with explicit liveness: anchor meta packs
                # (anchor slot << 10 | flags << 6 | w6); holes <= 3 away
                lv = jnp.where(ec < 0, jnp.int32(1), jnp.int32(0))
                fm = jnp.where(ec < 0,
                               (tB << 10) | (ec & jnp.int32(0x3FF)),
                               jnp.int32(0))
                wd = ep
                for m in (1, 2):
                    keepm = lv > 0
                    fm = jnp.where(keepm, fm, lanes.flat_shift_up(fm, m, 0))
                    wd = jnp.where(keepm, wd, lanes.flat_shift_up(wd, m, 0))
                    lv = lv | lanes.flat_shift_up(lv, m, 0)

                d = tB - (fm >> 10)
                fls = fm & jnp.int32(0xF)
                w6 = (fm >> 4) & jnp.int32(0x3F)
                # j = index of the (d+1)-th set flag bit
                c0 = fls & 1
                c01 = c0 + ((fls >> 1) & 1)
                c012 = c01 + ((fls >> 2) & 1)
                j = jnp.where(d < c0, 0,
                              jnp.where(d < c01, 1,
                                        jnp.where(d < c012, 2, 3)))
                wi = jax.lax.bitcast_convert_type(wd, jnp.int32)
                val = jnp.where(
                    j == 0, wi & 0xFF,
                    jnp.where(j == 1, (wi >> 8) & 0xFF,
                              jnp.where(j == 2, (wi >> 16) & 0xFF,
                                        (wi >> 24) & 0xFF)))
                start8 = (bm256 + (w6 << 2) + j) & jnp.int32(0xFF)
                payl = jnp.where(tB < K, (start8 << 8) | val,
                                 jnp.int32(0))

                # place at the running cursor (cc < 128: traced lane roll)
                padded = jnp.concatenate(
                    [payl, jnp.zeros((8, LANES), jnp.int32)], axis=0)
                shb = lanes.flat_shift_up(padded, cc, 0)
                shb = jnp.where((_iota((B + 8, LANES), 0) == 0)
                                & (_iota((B + 8, LANES), 1) < cc),
                                carry_row[...], shb)
                if B + 8 < R + 8:
                    shb = jnp.concatenate(
                        [shb, jnp.zeros((R - B, LANES), jnp.int32)],
                        axis=0)
                merged[...] = shb

        # bucketed emit (identical to production)
        bid = jnp.int32(0)
        for Bk in rl_pallas._EMIT_BUCKETS(R)[:-1]:
            bid = bid + (rows_used > Bk).astype(jnp.int32)
        for bi, Bk in enumerate(rl_pallas._EMIT_BUCKETS(R)):
            @pl.when(bid == bi)
            def _(Bk=Bk):
                pltpu.make_async_copy(
                    merged.at[:Bk], out_ref.at[pl.ds(out_row, Bk)],
                    sem).start()
        carry[3] = bid

        @pl.when(i == grid - 1)
        def _():
            for bi, Bk in enumerate(rl_pallas._EMIT_BUCKETS(R)):
                @pl.when(bid == bi)
                def _(Bk=Bk):
                    pltpu.make_async_copy(
                        merged.at[:Bk], out_ref.at[pl.ds(out_row, Bk)],
                        sem).wait()

        pr = (cc + K) // LANES
        carry_row[...] = jnp.sum(
            jnp.where(_iota((R + 8, LANES), 0) == pr, merged[...], 0),
            axis=0, keepdims=True)
        carry[2] = carry[2] + K
        carry[0] = p3[Rw - 1, LANES - 1]
        carry[1] = ls3[Rw - 1, LANES - 1]
        total_ref[0] = carry[2]
    return kernel


@functools.partial(jax.jit, static_argnames=("tile_rows", "buckets"))
def rl_encode_pallas_v2(x2d: jax.Array, n: jax.Array,
                        tile_rows: int | None = None, buckets=None):
    """Same contract as rl_pallas.rl_encode_pallas (u8 (rows,128) in,
    packed starts stream + total out)."""
    R = rl_pallas.TILE_ROWS if tile_rows is None else tile_rows
    assert R % 4 == 0
    if x2d.dtype == jnp.uint32:        # pre-converted word view
        rows = x2d.shape[0] * 4
        x32 = x2d
    else:
        rows = x2d.shape[0]
        x32 = jax.lax.bitcast_convert_type(
            x2d.reshape(rows, 32, 4), jnp.uint32).reshape(rows // 4,
                                                          LANES)
    assert x2d.shape[1] == LANES and rows % R == 0
    grid = rows // R
    Rw = R // 4

    packed, total = pl.pallas_call(
        _encode_kernel_v2(Rw, grid, buckets),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((Rw, LANES), lambda i: (i, 0),
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
    )(jnp.asarray(n, jnp.int32).reshape(1), x32)
    return packed.reshape(-1), total[0]


# ---------------------------------------------------------------------------
# parity battery (CPU interpret) + chip A/B
# ---------------------------------------------------------------------------

def _cases(R):
    g = np.random.default_rng(0)
    return [
        ("few-runs", g.integers(0, 4, 10_000, np.uint8)),
        ("cap-runs", np.repeat(g.integers(0, 8, 100, np.uint8),
                               300)[:20_000].copy()),
        ("dense", g.integers(0, 256, 9_000, np.uint8)),
        ("one-run", np.zeros(30_000, np.uint8)),
        ("exact-tile", np.full(R * 128, 7, np.uint8)),
        ("ramp", np.arange(256, dtype=np.uint8).repeat(97)[:17_000].copy()),
        ("tiny", g.integers(0, 2, 131).astype(np.uint8)),
        ("cap-boundary-255", np.full(255, 9, np.uint8)),
        ("cap-boundary-256", np.full(256, 9, np.uint8)),
        ("tile-straddle", np.repeat(
            g.integers(0, 16, 40, np.uint8), 500)[:R * 128 * 2 + 5].copy()),
        ("word-edges", np.repeat(np.arange(2000, dtype=np.int64),
                                 g.integers(1, 6, 2000)
                                 ).astype(np.uint8)[:30_000].copy()),
    ]


def parity(R=64):
    bad = 0
    for name, data in _cases(R):
        n = data.size
        tile = R * 128
        npad = max(tile, -(-n // tile) * tile)
        buf = np.zeros(npad, np.uint8)
        buf[:n] = data
        packed, total = rl_encode_pallas_v2(
            jnp.asarray(buf.reshape(-1, 128)), jnp.int32(n), tile_rows=R)
        counts, values = rl_pallas.rl_split_packed(packed, total,
                                                   jnp.int32(n))
        t = int(total)
        cg, vg = rl_numpy.encode(data)
        okc = np.array_equal(np.asarray(counts)[:t], cg)
        okv = np.array_equal(np.asarray(values)[:t], vg)
        print(f"{name}: {'OK' if okc and okv else 'MISMATCH'} "
              f"(runs {t} vs {cg.size})", flush=True)
        bad += not (okc and okv)
    return bad


def chip_ab():
    from fl_rl_compression_mpi_tpu.cli import _enable_compile_cache
    _enable_compile_cache()
    N = 64 << 20
    ROWS = N // 128
    rng = np.random.default_rng(0)
    nruns = N // 32
    host = np.repeat(rng.integers(0, 256, nruns, np.uint8),
                     rng.integers(16, 112, nruns))[:N].copy()
    x2d = jax.device_put(jnp.asarray(host.reshape(ROWS, 128)))
    nn = jnp.int32(N)

    def fence(v):
        jax.device_get(v.ravel()[-1])

    x32d = jax.device_put(jnp.asarray(
        host.view(np.uint32).reshape(ROWS // 4, 128)))

    def bitcast_only(v):
        return jax.lax.bitcast_convert_type(
            v.reshape(ROWS, 32, 4), jnp.uint32).reshape(ROWS // 4, LANES)

    variants = {
        "v1": lambda v: rl_pallas.rl_encode_pallas(v, nn)[0],
        "v2": lambda v: rl_encode_pallas_v2(v, nn)[0],
        # diagnostics: isolate the u8->u32 XLA bitcast relayout from the
        # kernel itself (v2w consumes a pre-converted word view)
        "bitcast": lambda v: jax.lax.bitcast_convert_type(
            bitcast_only(v), jnp.int32).reshape(-1),
        "v2w": lambda v: rl_encode_pallas_v2(v, nn)[0],
        "v2_b8": lambda v: rl_encode_pallas_v2(v, nn, buckets=(8,))[0],
    }
    inputs = {name: (x32d if name == "v2w" else x2d)
              for name in variants}
    chains = {}
    for name, enc in variants.items():
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(v, k, enc=enc):
            def one(_, y):
                packed = enc(y)
                # keep output alive but feed the SAME input again (pure
                # encode throughput; decode unchanged between variants)
                return jnp.where(packed[0] == _I32MAX, y + 1, y)
            return jax.lax.fori_loop(0, k, one, v)
        chains[name] = chain

    # parity on the bench stream
    p1, t1 = rl_pallas.rl_encode_pallas(x2d, nn)
    p2, t2 = rl_encode_pallas_v2(x2d, nn)
    t1i, t2i = int(t1), int(t2)
    ok = (t1i == t2i and np.array_equal(np.asarray(p1)[:t1i],
                                        np.asarray(p2)[:t2i]))
    print(f"bench-stream parity: {'OK' if ok else 'MISMATCH'} "
          f"({t1i} vs {t2i} runs)", flush=True)

    # also full-pair parity via packed decode
    out2 = rl_pallas.rl_decode_packed_pallas(p2, t2, ROWS)
    okrt = np.array_equal(np.asarray(out2).reshape(-1), host)
    print(f"v2 roundtrip: {'OK' if okrt else 'MISMATCH'}", flush=True)

    INNER = 8
    for name, c in chains.items():
        fence(c(inputs[name], 1))
        fence(c(inputs[name], 1 + INNER))
    for cycle in range(3):
        for name, c in chains.items():
            v = inputs[name]
            t0 = time.perf_counter()
            fence(c(v, 1))
            t1_ = time.perf_counter()
            fence(c(v, 1 + INNER))
            t2_ = time.perf_counter()
            t = ((t2_ - t1_) - (t1_ - t0)) / INNER
            print(f"cycle{cycle} {name} encode={N / 1e9 / t:.2f} GB/s",
                  flush=True)


if __name__ == "__main__":
    if "--chip" in sys.argv:
        sys.exit(chip_ab())
    sys.exit(parity())
