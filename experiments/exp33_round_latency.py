"""exp33 — dependency-latency microbench for Pallas vector rounds.

exp32 refuted the data-volume model: a word-granular RL encode touching
4x fewer vregs ran at the SAME speed as the byte-granular one.  New
hypothesis: scan/routing rounds form strict dependency chains, and on
small register arrays the VPU pipeline drains between rounds (cost per
round ~= max(issue_cost(vregs), dependency_latency)).

Toy chain: D=64 dependent rounds of ``y = y*3 + roll(y,1)`` over 32 MiB.

* single-R: one chain on (R,128) tiles, R in {8..512} — round cost vs
  array size maps the latency floor.
* inter2 / inter4: a (256,128) tile computed as 2x(128,128) / 4x(64,128)
  INDEPENDENT chains — same work and same per-element depth; if rounds
  are latency-bound at small sizes, the independent chains overlap and
  match the big tile's throughput instead of the small tile's.

Metric: round-throughput = bytes * D / time (GB/s of per-round data).

Run: timeout 1700 python experiments/exp33_round_latency.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fl_rl_compression_mpi_tpu.cli import _enable_compile_cache

_enable_compile_cache()

LANES = 128
D = 64


def make(R: int, rows_total: int, parts: int):
    grid = rows_total // R
    H = R // parts

    def kern(x_ref, o_ref):
        ys = [x_ref[h * H:(h + 1) * H] for h in range(parts)]
        for _ in range(D):
            ys = [y * 3 + pltpu.roll(y, 1, 1) for y in ys]
        for h, y in enumerate(ys):
            o_ref[h * H:(h + 1) * H] = y

    def run1(x):
        return pl.pallas_call(
            kern, grid=(grid,),
            in_specs=[pl.BlockSpec((R, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows_total, LANES), jnp.int32),
        )(x)

    import functools

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(x, k):
        return jax.lax.fori_loop(
            0, k, lambda _, y: run1(y), x.reshape(rows_total, LANES))
    return chain


def main():
    N = 32 << 20
    rows_total = N // 4 // LANES
    x = jax.device_put(jnp.asarray(
        np.random.default_rng(0).integers(0, 1 << 30, (rows_total, LANES),
                                          np.int32)))

    def fence(v):
        jax.device_get(v.ravel()[-1])

    variants = {f"single-{R}": make(R, rows_total, 1)
                for R in (8, 32, 64, 128, 256, 512)}
    variants["inter2-256"] = make(256, rows_total, 2)
    variants["inter4-256"] = make(256, rows_total, 4)
    variants["inter2-512"] = make(512, rows_total, 2)

    INNER = 16
    for f in variants.values():
        fence(f(x, 1))
        fence(f(x, 1 + INNER))

    for cycle in range(3):
        for name, f in variants.items():
            t0 = time.perf_counter()
            fence(f(x, 1))
            t1 = time.perf_counter()
            fence(f(x, 1 + INNER))
            t2 = time.perf_counter()
            t = ((t2 - t1) - (t1 - t0)) / INNER
            print(f"cycle{cycle} {name}: {t*1e3:.2f} ms  "
                  f"round-tput {N * D / 1e9 / t:.0f} GB/s", flush=True)


if __name__ == "__main__":
    sys.exit(main())
