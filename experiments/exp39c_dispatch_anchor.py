"""exp39c: anchor the odd-width A/B against the known-good pow2 fast
paths IN ONE SESSION.

If new(w8) >> old(w8) (exp37 measured 4.4x) the uniform dispatch works
and any missing w3 delta is the odd routing itself; if new(w8) ==
old(w8) the dispatch of this build is broken.  Encode-only and pair
rates, 3 interleaved cycles.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from fl_rl_compression_mpi_tpu.ops import fl_dense_pallas as dp

R = dp.DENSE_TILE_R
SIZE = 128 << 20
g = np.random.default_rng(93)

raw_enc = dp.fl_encode_dense_pallas.__wrapped__
raw_dec = dp.fl_decode_dense_pallas.__wrapped__

streams = {
    "w8": g.integers(128, 256, SIZE).astype(np.uint8),
    "w4": g.integers(8, 16, SIZE).astype(np.uint8),
    "w3": g.integers(4, 8, SIZE).astype(np.uint8),
}
n = SIZE
nf = jnp.int32(n // 128)


def make(enc, dec):
    def rt(w):
        b2, dense, _, woffs = enc(w, nf)
        return dec(dense.reshape(-1, 128), b2, woffs, nf).reshape(-1)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(w, k):
        return jax.lax.fori_loop(0, k, lambda _, v: rt(v), w)

    @functools.partial(jax.jit, static_argnames=("k",))
    def echain(w, k):
        def body(_, v):
            b2, dense, tot, _w = enc(v, nf)
            # data-dependent carry without the decoder: the predicate is
            # always true but opaque to XLA, so the encode cannot be
            # dead-code-eliminated (plain &0/*0 masking would fold)
            return jnp.where(tot > -1, v, dense[: v.size] ^ v)
        return jax.lax.fori_loop(0, k, body, w)
    return chain, echain


def diff_time(fn, words, inner=6):
    jax.device_get(fn(words, 1 + inner).ravel()[-1])
    t0 = time.perf_counter()
    jax.device_get(fn(words, 1).ravel()[-1])
    t1 = time.perf_counter()
    jax.device_get(fn(words, 1 + inner).ravel()[-1])
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / inner


# OLD: both fast paths DISABLED (general network only) — patch active
# through the old chains' traces, forced here.
_saved = (dp._odd_place_masks, dp._odd_unplace_masks,
          dp._uniform_place_masks, dp._uniform_unplace_masks)
dp._odd_place_masks = lambda r: (np.zeros((r, 128), np.int32), None)
dp._odd_unplace_masks = lambda r: (np.zeros((r, 128), np.int32), None)
dp._uniform_place_masks = lambda r: (np.zeros((1, 128), np.int32),
                                     np.zeros((r, 1), np.int32), None)
dp._uniform_unplace_masks = lambda r: (np.zeros((1, 128), np.int32),
                                       np.zeros((r, 1), np.int32), None)
enc_o = functools.partial(jax.jit, static_argnames=("tile_r",))(raw_enc)
dec_o = functools.partial(jax.jit, static_argnames=("tile_r",))(raw_dec)
chain_o, echain_o = make(enc_o, dec_o)
_w = jax.device_put(jnp.asarray(streams["w3"].view(np.uint32)))
assert bool(jax.device_get(jnp.array_equal(chain_o(_w, 1), _w)))
jax.device_get(chain_o(_w, 7).ravel()[-1])
jax.device_get(echain_o(_w, 1).ravel()[-1])
jax.device_get(echain_o(_w, 7).ravel()[-1])
del _w
(dp._odd_place_masks, dp._odd_unplace_masks,
 dp._uniform_place_masks, dp._uniform_unplace_masks) = _saved

chain_n, echain_n = make(dp.fl_encode_dense_pallas,
                         dp.fl_decode_dense_pallas)

res = {k: {"old": [], "new": [], "olde": [], "newe": []} for k in streams}
for cyc in range(3):
    for name, data in streams.items():
        words = jax.device_put(jnp.asarray(data.view(np.uint32)))
        ok = bool(jax.device_get(jnp.array_equal(chain_n(words, 1),
                                                 words)))
        assert ok, name
        res[name]["old"].append(round(2 * n / 1e9 / diff_time(
            chain_o, words), 1))
        res[name]["new"].append(round(2 * n / 1e9 / diff_time(
            chain_n, words), 1))
        res[name]["olde"].append(round(n / 1e9 / diff_time(
            echain_o, words), 1))
        res[name]["newe"].append(round(n / 1e9 / diff_time(
            echain_n, words), 1))
        del words
    print(f"cycle {cyc}: " + "  ".join(
        f"{k}[pair o/n={res[k]['old'][-1]}/{res[k]['new'][-1]} "
        f"enc o/n={res[k]['olde'][-1]}/{res[k]['newe'][-1]}]"
        for k in streams), flush=True)

print("\nfinal:")
for k, v in res.items():
    print(f"  {k}: pair old={v['old']} new={v['new']}  "
          f"enc old={v['olde']} new={v['newe']}")
