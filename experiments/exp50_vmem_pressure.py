"""Round-4: test the VMEM-pressure hypothesis for the dense general
kernel, and price the odd-branch/plane machinery.

exp48's cliffs need a mechanism: bare cursor-emit skeletons are FLAT to
R=2048 (exp38/exp41), so the collapse at R>=512 — and the regression of
the (reverted) round-4 package at equal R=256 — plausibly comes from
LIVE-ARRAY pressure: the kernel keeps the input tile, masks, the
(3R,128) odd planes, branch intermediates and the staging buffer
resident, and anything added past a knee forces spills.

Arms (encode+decode pairs, one compiled chain per variant reused across
data arms, 128 MiB, 3 cycles):
  prod    — production kernels (odd planes + 4 odd branches resident)
  noodd   — odd_tiles=False (drops the (3R,128)=384 KB planes and the
            odd dispatch branches; odd-uniform tiles -> general network)
  dead2/6 — production + 2/6 DEAD (R,128) VMEM scratches: if dead
            allocations alone cost throughput, pressure is confirmed
Data: mixed (general network), bmp (general), w4u (per-tile uniform).

Usage: timeout 1700 python experiments/exp50_vmem_pressure.py
SMOKE=1: interpret parity (tiny).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SMOKE = bool(int(os.environ.get("SMOKE", "0")))
if SMOKE:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fl_rl_compression_mpi_tpu.cli import _enable_compile_cache
from fl_rl_compression_mpi_tpu.ops import fl_dense_pallas, fl_numpy
from fl_rl_compression_mpi_tpu.ops.fl_dense_pallas import (
    _dense_pad_rows, _encode_kernel, _odd_place_masks,
    _uniform_place_masks)
from fl_rl_compression_mpi_tpu.ops.lanes import LANES

_enable_compile_cache()

SZ = (1 << 21) if SMOKE else (128 << 20)
CYCLES = 1 if SMOKE else 3
LAT_GEN = 0.05
R = 8 if SMOKE else 256


def time_chain(chain, w, inner, reps=3):
    jax.device_get(chain(w, 1).ravel()[-1])
    jax.device_get(chain(w, 1 + inner).ravel()[-1])
    ts, tds = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(chain(w, 1).ravel()[-1])
        t1 = time.perf_counter()
        jax.device_get(chain(w, 1 + inner).ravel()[-1])
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / inner)
        tds.append((t2 - t1 - LAT_GEN) / (1 + inner))
    return max(float(np.median(ts)), float(np.median(tds)), 1e-9)


@functools.partial(jax.jit, static_argnames=("tile_r", "n_dead"))
def enc_dead(words, n_frames, tile_r, n_dead):
    """fl_encode_dense_pallas clone with ``n_dead`` extra DEAD VMEM
    scratches appended (the kernel never touches them)."""
    Rr = tile_r
    nw = words.shape[0]
    grid = nw // (Rr * LANES)
    lw, rw, slots = _uniform_place_masks(Rr)
    fpw, oslots = _odd_place_masks(Rr)
    base = _encode_kernel(Rr, grid, slots, oslots)

    def kernel(*args):
        base(*args[: len(args) - n_dead])

    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((Rr, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Rr, rw.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fpw.shape[0], LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Rr, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nw // LANES, 4), jnp.uint8),
            jax.ShapeDtypeStruct((nw // LANES + _dense_pad_rows(Rr),
                                  LANES), jnp.uint32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((grid,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((2,), jnp.int32),
            pltpu.VMEM((1, LANES), jnp.uint32),
            pltpu.VMEM((Rr + 8, LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA,
        ] + [pltpu.VMEM((Rr, LANES), jnp.uint32)] * n_dead,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=jax.default_backend() != "tpu",
    )(jnp.asarray(n_frames, jnp.int32).reshape(1),
      words.reshape(nw // LANES, LANES), jnp.asarray(lw),
      jnp.asarray(rw), jnp.asarray(fpw))
    bits2d, dense, total, woffs = outs[:4]
    return bits2d, dense.reshape(-1), total[0], woffs


def main():
    rng = np.random.default_rng(0)
    n = SZ
    align = R * 512
    npad = -(-n // align) * align
    nf = jnp.int32(-(-n // 128))
    results = []

    def emit(row):
        results.append(row)
        print(json.dumps(row), flush=True)

    def mk_chain(enc_fn, dec_kw):
        def rt(w):
            b2, dense, _, woffs = enc_fn(w)
            return fl_dense_pallas.fl_decode_dense_pallas(
                dense.reshape(-1, 128), b2, woffs, nf, tile_r=R,
                **dec_kw).reshape(-1)

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(w, k):
            return jax.lax.fori_loop(0, k, lambda _, v: rt(v), w)
        return chain

    variants = {
        "prod": mk_chain(
            lambda w: fl_dense_pallas.fl_encode_dense_pallas(
                w, nf, tile_r=R), {}),
        "noodd": mk_chain(
            lambda w: fl_dense_pallas.fl_encode_dense_pallas(
                w, nf, tile_r=R, odd_tiles=False),
            {"odd_tiles": False}),
        "dead2": mk_chain(
            lambda w: enc_dead(w, nf, tile_r=R, n_dead=2), {}),
        "dead6": mk_chain(
            lambda w: enc_dead(w, nf, tile_r=R, n_dead=6), {}),
    }

    def mk_mixed():
        data = rng.integers(0, 256, npad).astype(np.uint8)
        nfr = -(-n // 128)
        wf = rng.integers(1, 9, nfr)
        m2 = data[: nfr * 128].reshape(nfr, 128)
        m2 &= ((1 << wf) - 1).astype(np.uint8)[:, None]
        m2[:, 0] = (1 << (wf - 1)).astype(np.uint8)
        data[n:] = 0
        return data

    def mk_bmp():
        bmp = np.fromfile(
            "/root/reference/example_input/sample_1280×853.bmp", np.uint8)
        d = np.resize(bmp, npad)
        d[n:] = 0
        return d

    def mk_w4():
        d = rng.integers(0, 16, npad).astype(np.uint8)
        d[::128] = 15
        d[n:] = 0
        return d

    arms = {"mixed": mk_mixed(), "bmp": mk_bmp(), "w4u": mk_w4()}
    data_d = {a: (jax.device_put(jnp.asarray(d.view(np.uint32))), d)
              for a, d in arms.items()}
    for vname, ch in variants.items():
        for aname, (wd, d) in data_d.items():
            o1 = np.asarray(jax.device_get(ch(wd, 1)))
            emit({"exp": 50, "variant": vname, "arm": aname,
                  "parity": bool(np.array_equal(
                      o1.view(np.uint8)[:n], d[:n]))})
    # golden spot check on noodd (odd branches off must stay bit-exact)
    bg, vg = fl_numpy.encode(arms["mixed"][:n])
    b2, dense, _, _ = fl_dense_pallas.fl_encode_dense_pallas(
        data_d["mixed"][0], nf, tile_r=R, odd_tiles=False)
    emit({"exp": 50, "check": "golden-noodd",
          "bits_ok": bool(np.array_equal(
              np.asarray(jax.device_get(b2)).reshape(-1)[: bg.size], bg)),
          "values_ok": bool(np.array_equal(
              np.asarray(jax.device_get(dense)).view(
                  np.uint8)[: vg.size], vg))})
    if SMOKE:
        return
    for cyc in range(CYCLES):
        for vname, ch in variants.items():
            for aname, (wd, _) in data_d.items():
                t = time_chain(ch, wd, inner=4)
                emit({"exp": 50, "cycle": cyc, "variant": vname,
                      "arm": aname,
                      "pair_gbps": round(2 * n / 1e9 / t, 1)})
    with open("/tmp/exp50.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
