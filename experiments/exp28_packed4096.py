"""Round-2: tile-packed fields v3 at R=4096 (raised Mosaic VMEM cap).

exp22/exp24 found the pack-by-2 field form (w<=4 tiles move 3N instead
of 4N per round trip) measures only par with the base kernels: ~1 us of
per-tile branch/DMA machinery eats the saved traffic at R=2048, and
R=4096 failed the default scoped-VMEM budget.  exp25 established
`vmem_limit_bytes` lifts that budget (4096/8192-row tiles compile and
run).  This re-runs exp24's v3 chain at R=4096 against the base chain
and copy ceiling, interleaved, on the bench dataset (w4) plus w8
(regression: depth never packs there, so v3 = pure machinery overhead).

Usage: timeout 1700 python experiments/exp28_packed4096.py
"""

import functools
import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fl_rl_compression_mpi_tpu.cli import _enable_compile_cache
from exp24_overhead import (_enc3_kernel, _dec3_kernel, FPR, LANES,
                            make_base_rt, make_copy_chain, time_chain)

_enable_compile_cache()
RESULTS = {}
SMOKE = bool(int(os.environ.get("FLRL_EXP28_SMOKE", "0")))
N = (1 << 22) if SMOKE else (256 << 20)
NROWS = (N // 4) // LANES
CYCLES = 1 if SMOKE else 3
VLIM = 100 << 20


def _interpret():
    return jax.default_backend() != "tpu"


def _params(vlim):
    kw = dict(dimension_semantics=("arbitrary",))
    if vlim:
        kw["vmem_limit_bytes"] = vlim
    return pltpu.CompilerParams(**kw)


def enc3v(R, nrows, vlim):
    grid = nrows // R

    @jax.jit
    def go(w):
        return pl.pallas_call(
            _enc3_kernel(R, grid),
            grid=(grid,),
            in_specs=[pl.BlockSpec((R, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((R, FPR), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nrows, FPR), jnp.uint8),
                jax.ShapeDtypeStruct((grid,), jnp.int32),
                jax.ShapeDtypeStruct((nrows, LANES), jnp.uint32),
            ],
            scratch_shapes=[
                pltpu.SMEM((2,), jnp.int32),
                pltpu.VMEM((R, LANES), jnp.uint32),
                pltpu.VMEM((R, LANES), jnp.uint32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=_params(vlim),
            interpret=_interpret(),
        )(w.reshape(nrows, LANES))
    return go


def dec3v(R, nrows, vlim):
    grid = nrows // R

    @jax.jit
    def go(bits2d, dep, packed):
        return pl.pallas_call(
            _dec3_kernel(R, grid),
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
                pltpu.VMEM((R, LANES), jnp.uint32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=_params(vlim),
            interpret=_interpret(),
        )(dep, bits2d, packed)
    return go


def make_rt3v(R, nrows, vlim):
    ego = enc3v(R, nrows, vlim)
    dgo = dec3v(R, nrows, vlim)

    def roundtrip(w):
        bits, dep, packed = ego(w)
        return dgo(bits, dep, packed).reshape(-1)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(w, k):
        return jax.lax.fori_loop(0, k, lambda _, v: roundtrip(v), w)
    return chain, ego, dgo


def main():
    rng = np.random.default_rng(0)
    datasets = {"w4": rng.integers(0, 16, N, np.uint8),
                "w8": rng.integers(0, 256, N, np.uint8)}
    words = {k: jax.device_put(jnp.asarray(v.view(np.uint32)))
             for k, v in datasets.items()}

    s = 8 if SMOKE else 1
    Rv = 256 if SMOKE else 4096
    chains = {}
    try:
        chain, ego, dgo = make_rt3v(Rv, NROWS, VLIM)
        for dn, host in datasets.items():
            out = dgo(*ego(words[dn]))
            ok = bool(np.array_equal(
                np.asarray(jax.device_get(out)).reshape(-1)
                .view(np.uint8), host))
            RESULTS[f"parity_v3_{Rv}_{dn}"] = ok
            print(f"parity v3_{Rv}/{dn}: {ok}", flush=True)
        chains[f"v3_{Rv}"] = (chain, 48 // s)
    except Exception:
        print(f"v3_{Rv}: BUILD FAILED "
              f"{traceback.format_exc()[-400:]}", flush=True)
    if not SMOKE:
        try:
            chains["v3_2048"] = (make_rt3v(2048, NROWS, VLIM)[0], 48)
        except Exception:
            print("v3_2048: BUILD FAILED", flush=True)
    chains["base_rt"] = (make_base_rt(2048, 1024), 48 // s)
    chains["copy_pair"] = (make_copy_chain(2048, NROWS), 48 // s)

    for cyc in range(CYCLES):
        for name, (chain, inner) in chains.items():
            for dn in (("w4",) if name == "copy_pair"
                       else ("w4", "w8")):
                try:
                    t = time_chain(chain, words[dn], inner,
                                   reps=(3 if cyc == 0 else 1))
                except Exception:
                    print(f"{name}/{dn}: RUN FAILED "
                          f"{traceback.format_exc()[-300:]}", flush=True)
                    continue
                r = 2 * N / 1e9 / t
                RESULTS.setdefault(f"{name}_{dn}", []).append(round(r, 1))
                print(f"cycle {cyc} {name}/{dn}: {r:.1f} GB/s",
                      flush=True)

    print(json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
