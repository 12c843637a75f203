"""exp31 — RL tile-size sweep on the chained pair metric.

exp13 measured encode tiles ABOVE the 256-row default (512/1024) slower;
the space BELOW (64/128) was never swept, and exp30's starts-routing
changed the round mix (the scans now dominate more, and scan row-ladders
shrink with log2(R)).  Sweep (enc_tile, dec_tile) combos interleaved on
the in-jit chained encode→decode loop (the honest same-session metric),
64 MiB long-run stream, parity-checked per combo.

Run (one TPU process): timeout 1700 python experiments/exp31_rl_tiles.py
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from fl_rl_compression_mpi_tpu.cli import _enable_compile_cache
from fl_rl_compression_mpi_tpu.ops import rl_pallas

_enable_compile_cache()

N = 64 << 20
ROWS = N // 128
rng = np.random.default_rng(0)
nruns = N // 32
host = np.repeat(rng.integers(0, 256, nruns, np.uint8),
                 rng.integers(16, 112, nruns))[:N].copy()
x2d = jax.device_put(jnp.asarray(host.reshape(ROWS, 128)))
nn = jnp.int32(N)

COMBOS = [(256, 128), (128, 128), (128, 64), (64, 64), (256, 64),
          (64, 128)]


def make_chain(et, dt):
    def pair(v):
        packed, total = rl_pallas.rl_encode_pallas(v, nn, tile_rows=et,
                                                   sub_rows=min(et, 256))
        return rl_pallas.rl_decode_packed_pallas(
            packed, total, ROWS, tile_rows=dt, sub_rows=min(dt, 128))

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(v, k):
        return jax.lax.fori_loop(0, k, lambda _, y: pair(y), v)
    return chain


def fence(x):
    jax.device_get(x.ravel()[-1])


chains = {}
for et, dt in COMBOS:
    c = make_chain(et, dt)
    o1 = np.asarray(jax.device_get(c(x2d, 1)))
    ok = bool(np.array_equal(o1.reshape(-1), host))
    print(f"enc={et} dec={dt} parity={'OK' if ok else 'FAIL'}",
          flush=True)
    if ok:
        chains[(et, dt)] = c
        fence(c(x2d, 1 + 8))          # warm the long variant

INNER = 8
for cycle in range(3):
    for (et, dt), c in chains.items():
        t0 = time.perf_counter()
        fence(c(x2d, 1))
        t1 = time.perf_counter()
        fence(c(x2d, 1 + INNER))
        t2 = time.perf_counter()
        t = ((t2 - t1) - (t1 - t0)) / INNER
        print(f"cycle{cycle} enc={et} dec={dt} "
              f"pair={2 * N / 1e9 / t:.2f} GB/s", flush=True)
