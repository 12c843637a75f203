"""Round-2 final chip validation.

  1. RL encode/decode after the DMA-overlap change (expect > the 7-8.6
     GB/s serialized numbers)
  2. dense FL decode: first hardware run — perf + parity
  3. full library round trip on device paths (fl_jax.encode -> container
     -> fl_jax.decode), the CLI's exact code path
  4. bench.py-equivalent chained headline re-check

Usage: timeout 1700 python experiments/exp12_final_validation.py
"""

import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from fl_rl_compression_mpi_tpu import container
from fl_rl_compression_mpi_tpu.cli import _enable_compile_cache
from fl_rl_compression_mpi_tpu.native import get_native
from fl_rl_compression_mpi_tpu.ops import fl_dense_pallas, fl_jax, \
    rl_jax, rl_numpy, rl_pallas

_enable_compile_cache()

RESULTS = {}


def fence(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[-1])


def timed(fn, reps=5, inner=4):
    out = fn()
    fence(out)

    def batch(k):
        t0 = time.perf_counter()
        for _ in range(k):
            o = fn()
        fence(o)
        return time.perf_counter() - t0

    ts = []
    for _ in range(reps):
        t1 = batch(1)
        t2 = batch(1 + inner)
        ts.append((t2 - t1) / inner)
    return out, max(float(np.median(ts)), 1e-9)


def attempt(name, fn):
    try:
        fn()
    except Exception:
        print(f"{name}: FAILED\n{traceback.format_exc()[-500:]}",
              flush=True)


def run_rl():
    n = 64 << 20
    nruns = n // 32
    g = np.random.default_rng(1)
    data = np.repeat(g.integers(0, 256, nruns, np.uint8),
                     g.integers(16, 112, nruns))[:n].copy()
    npad = -(-n // (1 << 20)) * (1 << 20)
    buf = np.zeros(npad, np.uint8)
    buf[:n] = data
    dev = jax.device_put(jnp.asarray(buf.reshape(-1, 128)))
    (packed, total), t = timed(
        lambda: rl_pallas.rl_encode_pallas(dev, jnp.int32(n)), reps=3,
        inner=2)
    RESULTS["rl_enc_overlap_gbps"] = round(n / 1e9 / t, 2)
    r = int(jax.device_get(total))
    cg, vg = rl_numpy.encode(data)
    counts, values = rl_pallas.rl_split_packed(packed)
    ok = (r == cg.size
          and np.array_equal(np.asarray(jax.device_get(counts[:r])), cg)
          and np.array_equal(np.asarray(jax.device_get(values[:r])), vg))
    RESULTS["rl_enc_ok"] = bool(ok)
    print(f"rl encode (DMA overlap): {n/1e9/t:.2f} GB/s parity={ok}",
          flush=True)

    rcap = -(-cg.size // (1 << 15)) * (1 << 15)
    cbuf = np.zeros(rcap, np.uint8)
    cbuf[: cg.size] = cg
    vbuf = np.zeros(rcap, np.uint8)
    vbuf[: vg.size] = vg
    cd = jax.device_put(jnp.asarray(cbuf))
    vd = jax.device_put(jnp.asarray(vbuf))
    out, t = timed(lambda: rl_pallas.rl_decode_pallas(
        cd, vd, jnp.int32(cg.size), npad // 128), reps=3, inner=2)
    RESULTS["rl_dec_gbps"] = round(n / 1e9 / t, 2)
    sl = np.asarray(jax.device_get(out.reshape(-1)[: 4 << 20]))
    RESULTS["rl_dec_ok"] = bool(np.array_equal(sl, data[: 4 << 20]))
    print(f"rl decode: {n/1e9/t:.2f} GB/s ok={RESULTS['rl_dec_ok']}",
          flush=True)


attempt("rl", run_rl)


def run_dense_dec():
    n = 256 << 20
    g = np.random.default_rng(0)
    host = g.integers(0, 16, n, np.uint8)
    nat = get_native()
    bits, values = nat.fl_encode(host)
    frames = bits.size
    R = fl_dense_pallas.DENSE_DEC_TILE_R
    rows = n // 512
    grid = rows // R
    fb = np.zeros(rows * 4, np.int64)
    fb[:frames] = bits
    wper = fb.reshape(grid, -1).sum(axis=1) * 4
    woffs = np.concatenate([[0], np.cumsum(wper)[:-1]]).astype(np.int32)
    vwords = -(-values.size // 4)
    pad_rows = vwords // 128 + R + 32
    dbuf = np.zeros(pad_rows * 512, np.uint8)
    dbuf[: values.size] = values
    b2 = np.zeros((rows, 4), np.uint8)
    b2.reshape(-1)[:frames] = bits
    dd = jax.device_put(jnp.asarray(dbuf.view(np.uint32).reshape(
        pad_rows, 128)))
    bd = jax.device_put(jnp.asarray(b2))
    wd = jax.device_put(jnp.asarray(woffs))
    out, t = timed(lambda: fl_dense_pallas.fl_decode_dense_pallas(
        dd, bd, wd, jnp.int32(frames)), reps=3, inner=2)
    RESULTS["dense_dec_gbps"] = round(n / 1e9 / t, 1)
    sl = np.ascontiguousarray(np.asarray(jax.device_get(
        out[: (8 << 20) // 512]))).reshape(-1).view(np.uint8)
    RESULTS["dense_dec_ok"] = bool(np.array_equal(sl, host[: sl.size]))
    print(f"dense decode: {n/1e9/t:.1f} GB/s ok={RESULTS['dense_dec_ok']}",
          flush=True)


attempt("dense_dec", run_dense_dec)


def run_roundtrip():
    # the CLI's exact library path, on-device dense both directions
    n = 32 << 20
    g = np.random.default_rng(7)
    data = np.repeat(g.integers(0, 64, n // 16, np.uint8), 16)[:n].copy()
    t0 = time.perf_counter()
    bits, values = fl_jax.encode(data)
    t_enc = time.perf_counter() - t0
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        p = f"{td}/x.fl"
        container.save_fl(p, container.FLCompressed(bits, values, n))
        c = container.load_fl(p)
        t0 = time.perf_counter()
        out = fl_jax.decode(c.input_size, c.bits, c.values)
        t_dec = time.perf_counter() - t0
    ok = bool(np.array_equal(out, data))
    nat = get_native()
    bg, vg = nat.fl_encode(data)
    exact = (np.array_equal(bits, bg) and np.array_equal(values, vg))
    RESULTS["lib_roundtrip_ok"] = ok and exact
    RESULTS["lib_enc_wall_s"] = round(t_enc, 2)
    RESULTS["lib_dec_wall_s"] = round(t_dec, 2)
    print(f"library fl roundtrip (32 MiB): ok={ok} container-exact={exact}"
          f" enc {t_enc:.2f}s dec {t_dec:.2f}s (tunnel transfers incl.)",
          flush=True)


attempt("roundtrip", run_roundtrip)

print(json.dumps(RESULTS), flush=True)
