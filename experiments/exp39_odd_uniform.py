"""exp39: odd-width (b ∈ {3,5,6,7}) uniform-tile static flat routing vs
the general network, dense FL pair, on chip.

Same-process A/B (round-2 rule: cross-session GB/s deltas are noise):
OLD = odd fast path disabled (general two-array network), NEW = flat
trace-time mask planes.  Chained encode→decode fori_loop pairs, paired
differencing, 3 interleaved cycles.  Parity: device-side roundtrip
equality at 128 MiB per width + full byte diff vs the NumPy golden on a
small stream pulled over the tunnel.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from fl_rl_compression_mpi_tpu.ops import fl_dense_pallas as dp
from fl_rl_compression_mpi_tpu.ops import fl_numpy

R = dp.DENSE_TILE_R
TILE = R * 512                     # bytes per tile
SIZE = 128 << 20
g = np.random.default_rng(39)

# --- variants ------------------------------------------------------------
raw_enc = dp.fl_encode_dense_pallas.__wrapped__
raw_dec = dp.fl_decode_dense_pallas.__wrapped__

# OLD: trace with the odd fast path disabled
_saved = (dp._odd_place_masks, dp._odd_unplace_masks)
dp._odd_place_masks = lambda r: (np.zeros((r, 128), np.int32), None)
dp._odd_unplace_masks = lambda r: (np.zeros((r, 128), np.int32), None)
enc_old = functools.partial(jax.jit, static_argnames=("tile_r",))(raw_enc)
dec_old = functools.partial(jax.jit, static_argnames=("tile_r",))(raw_dec)


def make_chain(enc, dec):
    def rt(w):
        b2, dense, _, woffs = enc(w, nf)
        out = dec(dense.reshape(-1, 128), b2, woffs, nf)
        return out.reshape(-1)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(w, k):
        return jax.lax.fori_loop(0, k, lambda _, v: rt(v), w)
    return chain


def pair_gbps(chain, words, n, inner=6):
    o1 = chain(words, 1)
    ok = bool(jax.device_get(jnp.array_equal(o1, words)))
    jax.device_get(chain(words, 1 + inner).ravel()[-1])
    t0 = time.perf_counter()
    jax.device_get(chain(words, 1).ravel()[-1])
    t1 = time.perf_counter()
    jax.device_get(chain(words, 1 + inner).ravel()[-1])
    t2 = time.perf_counter()
    return 2 * n / 1e9 / (((t2 - t1) - (t1 - t0)) / inner), ok


streams = {}
for b in (3, 5, 6, 7):
    streams[f"w{b}"] = (g.integers(1 << (b - 1), 1 << b, SIZE)
                        .astype(np.uint8))
streams["w3w5-mix"] = np.concatenate(
    [(g.integers(4, 8, SIZE // 2)).astype(np.uint8),
     (g.integers(16, 32, SIZE // 2)).astype(np.uint8)])

n = SIZE
nf = jnp.int32(n // 128)
chain_old = make_chain(enc_old, dec_old)

# jit traces at first CALL, not at wrap time: force the OLD variant's
# trace (for both k shapes) while the disable patch is active
_w0 = jax.device_put(jnp.asarray(streams["w3"].view(np.uint32)))
assert bool(jax.device_get(jnp.array_equal(chain_old(_w0, 1), _w0)))
jax.device_get(chain_old(_w0, 7).ravel()[-1])
del _w0

# restore and build NEW from the production entry points
dp._odd_place_masks, dp._odd_unplace_masks = _saved
chain_new = make_chain(dp.fl_encode_dense_pallas, dp.fl_decode_dense_pallas)

# --- small-stream byte parity (tunnel pull is 25 MB/s: keep it 1 MiB) ---
small = (g.integers(4, 8, 1 << 20)).astype(np.uint8)
ns = small.size
b2s, denses, totals, _ = dp.fl_encode_dense_pallas(
    jnp.asarray(small.view(np.uint32)), jnp.int32(ns // 128))
bg, vg = fl_numpy.encode(small)
vb = np.asarray(jax.device_get(denses)).view(np.uint8)
assert np.array_equal(np.asarray(b2s).reshape(-1)[: ns // 128], bg)
assert np.array_equal(vb[: vg.size], vg)
print("small w3 stream: dense bytes == NumPy golden", flush=True)

# --- interleaved A/B ------------------------------------------------------
results = {k: {"old": [], "new": []} for k in streams}
for cyc in range(3):
    for name, data in streams.items():
        words = jax.device_put(jnp.asarray(data.view(np.uint32)))
        for tag, chain in (("old", chain_old), ("new", chain_new)):
            gbps, ok = pair_gbps(chain, words, n)
            results[name][tag].append(round(gbps, 1))
            assert ok, (name, tag)
        del words
    print(f"cycle {cyc}: " + "  ".join(
        f"{k} old={results[k]['old'][-1]} new={results[k]['new'][-1]}"
        for k in streams), flush=True)

print("\nfinal (GB/s pair, 3 cycles):")
for k, v in results.items():
    print(f"  {k:10s} old={v['old']}  new={v['new']}")
