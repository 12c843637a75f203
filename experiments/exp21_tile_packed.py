"""Round-2: TILE-PACKED fields — halve the FL chain's HBM traffic.

The chained FL pair measures ~97% of the same-session copy ceiling
(exp18): the kernels are memory-bound and the remaining lever is MOVING
FEWER BYTES.  A field word at frame width b uses only 4b of its 32 bits.
Within a tile whose max frame width is bt (bt' = pow2ceil(bt) in
{1,2,4,8}), fields pack p = 8/bt' per word via d = log2(p) STATIC
halvings:

    step i (i = 0..d-1):  x = x[:m/2] | x[m/2:] << (16 >> i)

No routing networks, no per-lane addressing — each step is one static
slice + shift + or on shrinking halves (~3 ops/word total).  The slot
order is a fixed bit-interleave both sides derive statically; unpack is
the mirrored ladder with constant masks {0xFFFF, 0xFF00FF, 0xF0F0F0F}.

Emission is a sequential-grid cursor DMA (rows_t = R>>d_t per tile, all
multiples of R/8 ≥ 8 so read-back offsets stay 8-row aligned); per-tile
row offsets come back in SMEM for the decoder.

Expected, data at width 4 (the bench distribution): pair traffic drops
4N → 3N (encode writes N/2, decode reads N/2) → chained headline × 4/3.
Width-1 data: 4N → 2.25N (× 1.78).  Width-8: parity with production.

Measures (same session, interleaved cycles): production rt chain,
packed rt chain, copy-pair ceiling — at widths {1, 4, 8} data; parity
of every packed roundtrip vs the input and of widths vs production.

Usage: timeout 1700 python experiments/exp21_tile_packed.py
"""

import functools
import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fl_rl_compression_mpi_tpu.cli import _enable_compile_cache
from fl_rl_compression_mpi_tpu.ops import fl_pallas
from fl_rl_compression_mpi_tpu.ops.fl_pallas import (
    LANES, _frame_widths_mxu, _word_widths_f32exp)

_enable_compile_cache()
RESULTS = {}
SMOKE = bool(int(os.environ.get("FLRL_EXP21_SMOKE", "0")))
N = (1 << 21) if SMOKE else (256 << 20)
NROWS = (N // 4) // LANES
WPF = 32
FPR = 4
CYCLES = 1 if SMOKE else 3
_iota = lambda s, d: jax.lax.broadcasted_iota(jnp.int32, s, d)

# Python ints (module-level jnp constants are captured as device arrays
# and rejected by pallas kernels — FINDINGS.md)
_UNPACK_MASKS = {0: 0x0000FFFF, 1: 0x00FF00FF, 2: 0x0F0F0F0F}


def _interpret():
    return jax.default_backend() != "tpu"


def _depth(bt):
    """Pack depth from the tile max width: 32>>d >= 4*bt."""
    return jnp.where(bt <= 1, 3, jnp.where(bt <= 2, 2,
                     jnp.where(bt <= 4, 1, 0)))


def _spread(w, b_lane):
    m = jnp.uint32(1) << b_lane.astype(jnp.uint32)
    r = w >> 24
    r = r * m + ((w >> 16) & jnp.uint32(0xFF))
    r = r * m + ((w >> 8) & jnp.uint32(0xFF))
    return r * m + (w & jnp.uint32(0xFF))


def _unspread(f, b_lane):
    b = b_lane.astype(jnp.uint32)
    mask = (jnp.uint32(1) << b) - jnp.uint32(1)
    s1 = f >> b
    s2 = s1 >> b
    s3 = s2 >> b
    return ((f & mask) | ((s1 & mask) << 8)
            | ((s2 & mask) << 16) | ((s3 & mask) << 24))


def _b_lane_from_bits(bits_ref):
    b4 = bits_ref[...].astype(jnp.int32).astype(jnp.bfloat16)
    selT = (_iota((FPR, LANES), 0)
            == _iota((FPR, LANES), 1) // WPF).astype(jnp.bfloat16)
    return jnp.dot(b4, selT,
                   preferred_element_type=jnp.float32).astype(jnp.int32)


# ------------------------------------------------------------- encode
def _enc_kernel(R: int, grid: int):
    def kernel(w_ref, bits_ref, out_ref, offs_ref, st, merged, sem):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            st[0] = 0      # cursor (rows emitted)
            st[1] = 0      # prev start row
            st[2] = 0      # prev rows (0 = no pending DMA)

        w = w_ref[...].astype(jnp.uint32)
        o = w | (w >> 8)
        o = (o | (o >> 16)) & jnp.uint32(0xFF)
        b_fpr, b_lane = _frame_widths_mxu(_word_widths_f32exp(o), WPF)
        bits_ref[...] = b_fpr.astype(jnp.uint8)
        fields = _spread(w, b_lane)

        d = _depth(jnp.max(b_fpr))
        pk1 = fields[:R // 2] | (fields[R // 2:] << 16)
        pk2 = pk1[:R // 4] | (pk1[R // 4:] << 8)
        pk3 = pk2[:R // 8] | (pk2[R // 8:] << 4)

        # wait the previous tile's emit (it overlapped this compute)
        # before overwriting the staging buffer
        pv, pr = st[1], st[2]
        for sz in (R, R // 2, R // 4, R // 8):
            @pl.when(pr == sz)
            def _(sz=sz):
                pltpu.make_async_copy(
                    merged.at[:sz], out_ref.at[pl.ds(pv, sz)], sem).wait()

        cur = st[0]
        for dd, buf in ((0, fields), (1, pk1), (2, pk2), (3, pk3)):
            sz = R >> dd

            @pl.when(d == dd)
            def _(sz=sz, buf=buf):
                merged[:sz] = buf
                pltpu.make_async_copy(
                    merged.at[:sz], out_ref.at[pl.ds(cur, sz)], sem
                ).start()

                @pl.when(i == grid - 1)
                def _():
                    pltpu.make_async_copy(
                        merged.at[:sz], out_ref.at[pl.ds(cur, sz)], sem
                    ).wait()

        rows_t = (R >> d).astype(jnp.int32)
        offs_ref[i] = cur
        offs_ref[grid] = cur + rows_t   # last write wins = total
        st[1] = cur
        st[2] = rows_t
        st[0] = cur + rows_t
    return kernel


def enc_packed(R: int, nrows: int):
    grid = nrows // R

    @jax.jit
    def go(w):
        return pl.pallas_call(
            _enc_kernel(R, grid),
            grid=(grid,),
            in_specs=[pl.BlockSpec((R, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((R, FPR), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nrows, FPR), jnp.uint8),
                jax.ShapeDtypeStruct((nrows, LANES), jnp.uint32),
                jax.ShapeDtypeStruct((grid + 1,), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.SMEM((3,), jnp.int32),
                pltpu.VMEM((R, LANES), jnp.uint32),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=_interpret(),
        )(w.reshape(nrows, LANES))
    return go


# ------------------------------------------------------------- decode
def _dec_kernel(R: int):
    def kernel(offs_ref, bits_ref, packed_hbm, out_ref, win, sem):
        i = pl.program_id(0)
        b_lane = _b_lane_from_bits(bits_ref)
        bt = jnp.max(bits_ref[...].astype(jnp.int32))
        d = _depth(bt)
        off = offs_ref[i]

        for dd in range(4):
            sz = R >> dd

            @pl.when(d == dd)
            def _(sz=sz, dd=dd):
                cp = pltpu.make_async_copy(
                    packed_hbm.at[pl.ds(off, sz)], win.at[:sz], sem)
                cp.start()
                cp.wait()
                z = win[:sz]
                for s in reversed(range(dd)):
                    M = jnp.uint32(_UNPACK_MASKS[s])
                    z = jnp.concatenate(
                        [z & M, (z >> (16 >> s)) & M], axis=0)
                out_ref[...] = _unspread(z, b_lane)
    return kernel


def dec_packed(R: int, nrows: int):
    grid = nrows // R

    @jax.jit
    def go(bits2d, packed, offs):
        return pl.pallas_call(
            _dec_kernel(R),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((R, FPR), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((R, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nrows, LANES), jnp.uint32),
            scratch_shapes=[
                pltpu.VMEM((R, LANES), jnp.uint32),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=_interpret(),
        )(offs, bits2d, packed)
    return go


# ------------------------------------------------------------- harness
def make_packed_rt(R, nrows):
    ego = enc_packed(R, nrows)
    dgo = dec_packed(R, nrows)

    def roundtrip(w):
        bits, packed, offs = ego(w)
        return dgo(bits, packed, offs).reshape(-1)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(w, k):
        return jax.lax.fori_loop(0, k, lambda _, v: roundtrip(v), w)
    return chain


def make_base_rt(et, dt):
    def roundtrip(w):
        b, f = fl_pallas.fl_encode_fields_pallas(w, jnp.int32(N),
                                                 tile_r=et)
        return fl_pallas.fl_decode_fields_pallas(f, b, jnp.int32(N),
                                                 tile_r=dt)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(w, k):
        return jax.lax.fori_loop(0, k, lambda _, v: roundtrip(v), w)
    return chain


def make_copy_chain(tile_r, nrows):
    grid = nrows // tile_r

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + jnp.uint32(1)

    def cp(w):
        return pl.pallas_call(
            kernel, grid=(grid,),
            in_specs=[pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tile_r, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nrows, LANES), jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=_interpret(),
        )(w.reshape(nrows, LANES)).reshape(-1)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(w, k):
        return jax.lax.fori_loop(0, k, lambda _, v: cp(cp(v)), w)
    return chain


def time_chain(chain, w, inner, reps=3):
    jax.device_get(chain(w, 1).ravel()[-1])
    jax.device_get(chain(w, 1 + inner).ravel()[-1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(chain(w, 1).ravel()[-1])
        t1 = time.perf_counter()
        jax.device_get(chain(w, 1 + inner).ravel()[-1])
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / inner)
    return max(float(np.median(ts)), 1e-9)


def main():
    rng = np.random.default_rng(0)
    datasets = {
        "w4": rng.integers(0, 16, N, np.uint8),
        "w8": rng.integers(0, 256, N, np.uint8),
        "w1": rng.integers(0, 2, N, np.uint8),
    }
    # parity set: tiles of varying widths + tail oddities
    mix = rng.integers(0, 16, N, np.uint8)
    k3 = N // 3
    mix[:k3] &= 1
    mix[N - k3:] = rng.integers(0, 256, k3, np.uint8)
    datasets["mix"] = mix

    # ---- parity (small R so multiple tiles + all depths exercised)
    Rp = 256 if SMOKE else 1024
    ego = enc_packed(Rp, NROWS)
    dgo = dec_packed(Rp, NROWS)
    for name, hostd in datasets.items():
        w = jax.device_put(jnp.asarray(hostd.view(np.uint32)))
        bits, packed, offs = ego(w)
        out = dgo(bits, packed, offs)
        ok = bool(np.array_equal(
            np.asarray(jax.device_get(out)).reshape(-1).view(np.uint8),
            hostd))
        # widths parity vs production
        bprod, _ = fl_pallas.fl_encode_fields_pallas(
            w, jnp.int32(N), tile_r=(256 if SMOKE else 1024))
        bok = bool(np.array_equal(np.asarray(jax.device_get(bits)),
                                  np.asarray(jax.device_get(bprod))))
        total = int(np.asarray(jax.device_get(offs))[-1])
        RESULTS[f"parity_{name}"] = ok
        RESULTS[f"bits_parity_{name}"] = bok
        RESULTS[f"rows_frac_{name}"] = round(total / NROWS, 3)
        print(f"parity {name}: rt={ok} bits={bok} "
              f"rows={total}/{NROWS}", flush=True)
        if not ok:
            return

    s = 16 if SMOKE else 1
    chains = {
        "copy_pair": (make_copy_chain(2048, NROWS), None, 4 * N,
                      48 // s),
        "base_rt": (make_base_rt(2048, 1024), None, None, 64 // s),
        "pk_rt_1024": (make_packed_rt(1024, NROWS), None, None, 64 // s),
        "pk_rt_2048": (make_packed_rt(2048, NROWS), None, None, 64 // s),
    }
    if SMOKE:
        chains.pop("pk_rt_2048")
        chains["pk_rt_1024"] = (make_packed_rt(256, NROWS), None, None, 4)

    words = {k: jax.device_put(jnp.asarray(v.view(np.uint32)))
             for k, v in datasets.items() if k != "mix"}

    for cyc in range(CYCLES):
        for name, (chain, _, nbytes, inner) in chains.items():
            for dn, w in (words.items() if name != "copy_pair"
                          else [("w4", words["w4"])]):
                try:
                    t = time_chain(chain, w, inner,
                                   reps=(3 if cyc == 0 else 1))
                except Exception:
                    print(f"{name}/{dn}: FAILED "
                          f"{traceback.format_exc()[-300:]}", flush=True)
                    continue
                # credited basis: 2N per roundtrip (the bench headline)
                r = (2 * N) / 1e9 / t
                RESULTS.setdefault(f"{name}_{dn}", []).append(round(r, 1))
                print(f"cycle {cyc} {name}/{dn}: {r:.1f} GB/s (credited)",
                      flush=True)

    print(json.dumps(RESULTS), flush=True)


try:
    main()
except Exception:
    print(f"MAIN FAILED\n{traceback.format_exc()[-1200:]}", flush=True)
    print(json.dumps(RESULTS), flush=True)
