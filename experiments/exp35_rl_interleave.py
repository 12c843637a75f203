"""exp35 — P-way interleaved RL encode.

exp33 measured Pallas vector rounds on this chip as DEPENDENCY-LATENCY
bound: a round costs ~67 ns whether it touches (8,128) or (256,128),
and P independent chains interleave for ~1.15-1.3x the cost of one.
The production RL encode is one ~55-round dependency chain per 32 KiB
tile — so P sub-pipelines per kernel step should give ~P/1.3x.

Design (P subs of R=256 byte rows per grid step):
  phase A  per-sub flags + key prefix-max        (P independent chains)
  phase B  residue scalar chain (r_k tail extracts -> res_{k+1})
  phase C  per-sub pflag/keep/prefix-sum/payload (P independent chains)
  phase D  cursor scalar chain (off_{k+1} = off_k + K_k)
  phase E  per-sub compact + cc lane shift + boundary-row OR
  merge    sh_0 stored to the big staging buffer at row 0; sh_1..P-1
           VMEM->VMEM DMA'd at dynamic row deltas IN ORDER (later copies
           re-provide the shared boundary row, so overwrites are exact)
  emit     ONE bucketed HBM DMA per grid step from the big buffer

Contract identical to rl_pallas.rl_encode_pallas (packed starts stream,
total); cross-tile carries identical (prev byte, residue, cursor).

Run CPU parity: env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python experiments/exp35_rl_interleave.py
Run chip A/B:   timeout 1700 python experiments/exp35_rl_interleave.py --chip
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


def _mod255(x):
    s = ((x & 255) + ((x >> 8) & 255) + ((x >> 16) & 255)
         + ((x >> 24) & 255))
    s = (s & 255) + (s >> 8)
    s = (s & 255) + (s >> 8)
    return jnp.where(s >= 255, s - 255, s)


# --- round-major multi-array primitives -----------------------------------
# The first exp35 run emitted each sub-pipeline's rounds in program order
# (sub 0's whole scan, then sub 1's, ...) and measured SLOWER than v1:
# Mosaic does not reorder across long chains, so dependency latency was
# never hidden.  These variants interleave P independent arrays round by
# round at source level — the structure exp33's microbench proved cheap.

def _pm_flat_multi(xs, fill=-(2 ** 31)):
    fill = jnp.int32(fill)
    rows = xs[0].shape[0]
    lane = _iota(xs[0].shape, 1)
    ps = list(xs)
    for k in (1, 2, 4, 8, 16, 32, 64):
        shs = [pltpu.roll(p, k, 1) for p in ps]
        ps = [jnp.maximum(p, jnp.where(lane >= k, sh, fill))
              for p, sh in zip(ps, shs)]
    rts = [jnp.broadcast_to(jnp.max(p, axis=1, keepdims=True), p.shape)
           for p in ps]
    accs = [flat_shift_up(rt, LANES, fill) for rt in rts]
    k = 1
    while k < rows:
        accs = [jnp.maximum(a, flat_shift_up(a, k * LANES, fill))
                for a in accs]
        k *= 2
    return [jnp.maximum(p, a) for p, a in zip(ps, accs)]


def _ps_flat_multi(xs):
    rows = xs[0].shape[0]
    lane = _iota(xs[0].shape, 1)
    ps = list(xs)
    for k in (1, 2, 4, 8, 16, 32, 64):
        shs = [pltpu.roll(p, k, 1) for p in ps]
        ps = [p + jnp.where(lane >= k, sh, 0)
              for p, sh in zip(ps, shs)]
    rts = [jnp.broadcast_to(p[:, LANES - 1:LANES], p.shape) for p in ps]
    accs = [flat_shift_up(rt, LANES, 0) for rt in rts]
    k = 1
    while k < rows:
        accs = [a + flat_shift_up(a, k * LANES, 0) for a in accs]
        k *= 2
    return [p + a for p, a in zip(ps, accs)]


def _compact_lsb_multi(ws, nbits):
    from fl_rl_compression_mpi_tpu.ops.lanes import (DIST_SHIFT,
                                                     flat_shift_down)
    ws = list(ws)
    for k in range(nbits):
        m = 1 << k
        shs = [flat_shift_down(w, m, 0) for w in ws]
        nxt = []
        for w, sh in zip(ws, shs):
            take_in = (sh < 0) & ((sh & (m << DIST_SHIFT)) != 0)
            take_self = (w < 0) & ((w & (m << DIST_SHIFT)) != 0)
            nxt.append(jnp.where(take_in, sh - (m << DIST_SHIFT),
                                 jnp.where(take_self, jnp.int32(0), w)))
        ws = nxt
    return ws


def _shift_up_dyn_lane_multi(xs, ms):
    ys = list(xs)
    ms = [jnp.asarray(m, jnp.int32) for m in ms]
    rows = xs[0].shape[0]
    for k in (1, 2, 4, 8, 16, 32, 64):
        az = [pltpu.roll(y, k, 1) for y in ys]
        bz = [pltpu.roll(a, 1, 0) for a in az]
        ys = [jnp.where((m & k) != 0,
                        jnp.where(_iota(y.shape, 1) >= k, a, b), y)
              for y, a, b, m in zip(ys, az, bz, ms)]
    return [jnp.where(flat_idx(rows) >= m, y, jnp.int32(0))
            for y, m in zip(ys, ms)]


def _encode_kernel_p(R: int, P: int, grid: int):
    nbits = (R * LANES - 1).bit_length()
    RT = P * R                       # byte rows per grid step
    BIG = RT + 16                    # staging rows (copy slack)

    def kernel(n_ref, xm_ref, out_ref, total_ref,
               carry, carry_row, big, small, sem, csem):
        i = pl.program_id(0)
        n = n_ref[0]

        @pl.when(i == 0)
        def _():
            carry[0] = -1
            carry[1] = 0
            carry[2] = 0
            carry_row[...] = jnp.zeros((1, LANES), jnp.int32)

        fidx = flat_idx(R)
        xm = [xm_ref[k * R:(k + 1) * R].astype(jnp.int32)
              for k in range(P)]

        # phase A: flags + run-start-key prefix max, round-major
        s, gmod, keys = [], [], []
        for k in range(P):
            prevb = carry[0] if k == 0 else xm[k - 1][R - 1, LANES - 1]
            prev = flat_shift_up(xm[k], 1, 0)
            prev = jnp.where(fidx == 0, prevb, prev)
            sk = xm[k] != prev
            gidx = i * RT * LANES + k * R * LANES + fidx
            gm = _mod255(gidx)
            s.append(sk)
            gmod.append(gm)
            keys.append(jnp.where(sk, (fidx << 8) | gm, -1))
        r = _pm_flat_multi(keys)

        # phase B: residue scalar chain
        res = [carry[1]]
        for k in range(P):
            last = r[k][R - 1, LANES - 1]
            res.append(jnp.where(last >= 0, last & 255, res[k]))

        # phase C: piece flags + rank scan + payload, round-major
        keep, K, pay16 = [], [], []
        for k in range(P):
            lsmod = jnp.where(r[k] >= 0, r[k] & 255, res[k])
            gidx = i * RT * LANES + k * R * LANES + fidx
            pf = s[k] | (gmod[k] == lsmod)
            kp = pf & (gidx < n)
            keep.append(kp.astype(jnp.int32))
            pay16.append((xm[k] & jnp.int32(0xFF))
                         | ((gidx & jnp.int32(0xFF)) << 8))
        psum = _ps_flat_multi(keep)
        for k in range(P):
            K.append(psum[k][R - 1, LANES - 1])

        # phase D: cursor scalar chain
        off = [carry[2]]
        for k in range(P):
            off.append(off[k] + K[k])

        # phase E: compact + lane-place, round-major; boundary OR chain
        ws = [lanes.pack_route(keep[k] > 0, fidx - (psum[k] - 1),
                               pay16[k]) for k in range(P)]
        wcs = _compact_lsb_multi(ws, nbits)
        ccs = [off[k] % LANES for k in range(P)]
        parts = [jnp.concatenate(
            [wc & jnp.int32(0xFFFF),
             jnp.zeros((8, LANES), jnp.int32)], axis=0) for wc in wcs]
        shs0 = _shift_up_dyn_lane_multi(parts, ccs)
        sh = []
        for k in range(P):
            if k == 0:
                head = carry_row[...]
            else:
                pr = (off[k - 1] % LANES + K[k - 1]) // LANES
                head = jnp.sum(
                    jnp.where(_iota((R + 8, LANES), 0) == pr, sh[k - 1],
                              0),
                    axis=0, keepdims=True)
            sh.append(shs0[k]
                      | jnp.where((_iota((R + 8, LANES), 0) == 0)
                                  & (_iota((R + 8, LANES), 1) < ccs[k]),
                                  head, jnp.int32(0)))

        # await the previous grid step's HBM emit before touching `big`
        out_row = carry[2] // LANES
        rows_tot = jnp.maximum(
            (carry[2] % LANES + (off[P] - off[0]) + LANES - 1) // LANES,
            1)

        @pl.when(i > 0)
        def _():
            for bi, Bk in enumerate(rl_pallas._EMIT_BUCKETS(RT)):
                @pl.when(carry[3] == bi)
                def _(Bk=Bk):
                    pltpu.make_async_copy(
                        big.at[:Bk],
                        out_ref.at[pl.ds(carry[4], Bk)], sem).wait()

        big[:R + 8] = sh[0]
        big[R + 8:] = jnp.zeros((BIG - R - 8, LANES), jnp.int32)
        for k in range(1, P):
            small[...] = sh[k]
            dlt = off[k] // LANES - off[0] // LANES
            ru = (off[k] % LANES + K[k]) // LANES + 1
            bid_k = jnp.int32(0)
            for Bk in rl_pallas._EMIT_BUCKETS(R)[:-1]:
                bid_k = bid_k + (ru > Bk).astype(jnp.int32)
            for bi, Bk in enumerate(rl_pallas._EMIT_BUCKETS(R)):
                @pl.when(bid_k == bi)
                def _(Bk=Bk, dlt=dlt):
                    cp = pltpu.make_async_copy(
                        small.at[:Bk], big.at[pl.ds(dlt, Bk)], csem)
                    cp.start()
                    cp.wait()

        bid = jnp.int32(0)
        for Bk in rl_pallas._EMIT_BUCKETS(RT)[:-1]:
            bid = bid + (rows_tot > Bk).astype(jnp.int32)
        for bi, Bk in enumerate(rl_pallas._EMIT_BUCKETS(RT)):
            @pl.when(bid == bi)
            def _(Bk=Bk):
                pltpu.make_async_copy(
                    big.at[:Bk], out_ref.at[pl.ds(out_row, Bk)],
                    sem).start()
        carry[3] = bid
        carry[4] = out_row

        @pl.when(i == grid - 1)
        def _():
            for bi, Bk in enumerate(rl_pallas._EMIT_BUCKETS(RT)):
                @pl.when(bid == bi)
                def _(Bk=Bk):
                    pltpu.make_async_copy(
                        big.at[:Bk], out_ref.at[pl.ds(out_row, Bk)],
                        sem).wait()

        # cross-tile carries: the stream's final partial row lives in
        # sh[P-1] (boundary ORs accumulate forward)
        prl = (off[P - 1] % LANES + K[P - 1]) // LANES
        carry_row[...] = jnp.sum(
            jnp.where(_iota((R + 8, LANES), 0) == prl, sh[P - 1], 0),
            axis=0, keepdims=True)
        carry[0] = xm[P - 1][R - 1, LANES - 1]
        carry[1] = res[P]
        carry[2] = off[P]
        total_ref[0] = carry[2]
    return kernel


@functools.partial(jax.jit, static_argnames=("tile_rows", "p"))
def rl_encode_pallas_p(x2d: jax.Array, n: jax.Array,
                       tile_rows: int | None = None, p: int = 4):
    """P-way interleaved RL encode; same contract as rl_encode_pallas.
    ``tile_rows`` is the per-SUB row count (default production 256);
    rows must be a multiple of p * tile_rows."""
    R = rl_pallas.TILE_ROWS if tile_rows is None else tile_rows
    rows = x2d.shape[0]
    RT = p * R
    assert x2d.shape[1] == LANES and rows % RT == 0
    assert R * LANES <= 1 << 15
    grid = rows // RT

    packed, total = pl.pallas_call(
        _encode_kernel_p(R, p, grid),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((RT, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows + RT + 24, LANES), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((5,), jnp.int32),
            pltpu.VMEM((1, LANES), jnp.int32),
            pltpu.VMEM((RT + 16, LANES), jnp.int32),
            pltpu.VMEM((R + 8, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(jnp.asarray(n, jnp.int32).reshape(1), x2d)
    return packed.reshape(-1), total[0]


# ---------------------------------------------------------------------------
# parity + chip A/B
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
        ("sub-straddle", np.repeat(
            g.integers(0, 16, 40, np.uint8), 500)[:R * 128 * 2 + 5].copy()),
        ("full-dense-2tiles", np.arange(256, dtype=np.uint8)[
            g.integers(0, 256, R * 128 * 8 + 130)].astype(np.uint8)),
    ]


def parity(R=32, ps=(2, 4)):
    bad = 0
    for p in ps:
        for name, data in _cases(R):
            nn = data.size
            tile = p * R * 128
            npad = max(tile, -(-nn // tile) * tile)
            buf = np.zeros(npad, np.uint8)
            buf[:nn] = data
            packed, total = rl_encode_pallas_p(
                jnp.asarray(buf.reshape(-1, 128)), jnp.int32(nn),
                tile_rows=R, p=p)
            counts, values = rl_pallas.rl_split_packed(
                packed, total, jnp.int32(nn))
            t = int(total)
            cg, vg = rl_numpy.encode(data)
            okc = np.array_equal(np.asarray(counts)[:t], cg)
            okv = np.array_equal(np.asarray(values)[:t], vg)
            print(f"p{p} {name}: {'OK' if okc and okv else 'MISMATCH'} "
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

    variants = {
        "v1": lambda v: rl_pallas.rl_encode_pallas(v, nn)[0],
        "p2": lambda v: rl_encode_pallas_p(v, nn, p=2)[0],
        "p4": lambda v: rl_encode_pallas_p(v, nn, p=4)[0],
        "p8": lambda v: rl_encode_pallas_p(v, nn, p=8)[0],
    }
    chains = {}
    for name, enc in variants.items():
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(v, k, enc=enc):
            def one(_, y):
                packed = enc(y)
                return jnp.where(packed[0] == _I32MAX, y + 1, y)
            return jax.lax.fori_loop(0, k, one, v)
        chains[name] = chain

    p1, t1 = rl_pallas.rl_encode_pallas(x2d, nn)
    for pname, pp in (("p2", 2), ("p4", 4), ("p8", 8)):
        p2, t2 = rl_encode_pallas_p(x2d, nn, p=pp)
        t1i, t2i = int(t1), int(t2)
        ok = (t1i == t2i and np.array_equal(np.asarray(p1)[:t1i],
                                            np.asarray(p2)[:t2i]))
        print(f"{pname} bench-stream parity: {'OK' if ok else 'MISMATCH'}"
              f" ({t1i} vs {t2i})", flush=True)
        if not ok:
            del chains[pname]

    INNER = 8
    for name, c in chains.items():
        fence(c(x2d, 1))
        fence(c(x2d, 1 + INNER))
    for cycle in range(3):
        for name, c in chains.items():
            t0 = time.perf_counter()
            fence(c(x2d, 1))
            ta = time.perf_counter()
            fence(c(x2d, 1 + INNER))
            tb = time.perf_counter()
            t = ((tb - ta) - (ta - t0)) / INNER
            print(f"cycle{cycle} {name} encode={N / 1e9 / t:.2f} GB/s",
                  flush=True)


if __name__ == "__main__":
    if "--chip" in sys.argv:
        sys.exit(chip_ab())
    sys.exit(parity())
