"""exp39d: read the encoder's per-tile dispatch record ON CHIP and time
the same session — separates "fast path not engaging" from "session
degraded" (exp39b/c measured every variant at ~27 GB/s where exp37 and
today's bench session put the w4 fast path at 59-66)."""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from fl_rl_compression_mpi_tpu.ops import fl_dense_pallas as dp

SIZE = 128 << 20
g = np.random.default_rng(94)
n = SIZE
nf = jnp.int32(n // 128)

streams = {
    "w8": g.integers(128, 256, SIZE).astype(np.uint8),
    "w4": g.integers(8, 16, SIZE).astype(np.uint8),
    "w3": g.integers(4, 8, SIZE).astype(np.uint8),
}


def rt(w):
    b2, dense, _, woffs = dp.fl_encode_dense_pallas(w, nf)
    return dp.fl_decode_dense_pallas(
        dense.reshape(-1, 128), b2, woffs, nf).reshape(-1)


@functools.partial(jax.jit, static_argnames=("k",))
def chain(w, k):
    return jax.lax.fori_loop(0, k, lambda _, v: rt(v), w)


for name, data in streams.items():
    words = jax.device_put(jnp.asarray(data.view(np.uint32)))
    flags = np.asarray(jax.device_get(dp.fl_encode_dense_pallas(
        words, nf, debug_path=True)[4]))
    u, c = np.unique(flags, return_counts=True)
    print(f"{name}: dispatch flags {dict(zip(u.tolist(), c.tolist()))}",
          flush=True)
    ok = bool(jax.device_get(jnp.array_equal(chain(words, 1), words)))
    inner = 6
    jax.device_get(chain(words, 1 + inner).ravel()[-1])
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(chain(words, 1).ravel()[-1])
        t1 = time.perf_counter()
        jax.device_get(chain(words, 1 + inner).ravel()[-1])
        t2 = time.perf_counter()
        rates.append(round(2 * n / 1e9 / (((t2 - t1) - (t1 - t0)) / inner),
                           1))
    print(f"{name}: ok={ok} pair GB/s {rates}", flush=True)
    del words
