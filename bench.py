"""Benchmark driver — prints ONE JSON line with the headline metric.

Measures the FL codec on the real TPU chip (platform from the environment;
do NOT force CPU here): encode + decode of a 256 MiB synthetic low-entropy
stream (BASELINE.json config "FL on-TPU single chip"), device-resident data,
jitted steps, median of repeated timed runs after a warmup/compile pass.

Headline: aggregate codec throughput = bytes_processed / time across
encode+decode, in input GB/s.  ``vs_baseline`` is the fraction of the
per-chip memory-bandwidth speed-of-light estimate (the reference publishes
no numbers — SURVEY.md §6 — so BASELINE.json's ≥80%-of-SOL target is the
yardstick): v5e HBM ≈ 819 GB/s; encode must read N and write ~r·N, decode
the reverse, so SOL input-throughput ≈ 819 / (1 + r) with r the measured
compression ratio.

Usage: python bench.py [--size-mb 256] [--method fl|rl] [--json-only]
"""

import argparse
import json
import sys
import time

import numpy as np


def _median_time(fn, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size-mb", type=int, default=256)
    ap.add_argument("--method", choices=["fl", "rl"], default="fl")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--json-only", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from fl_rl_compression_mpi_tpu.cli import _enable_compile_cache
    from fl_rl_compression_mpi_tpu.ops import fl_jax, rl_jax
    _enable_compile_cache()

    hbm_gbps = 819.0  # v5e HBM bandwidth (speed-of-light yardstick)

    n = args.size_mb * (1 << 20)
    rng = np.random.default_rng(0)
    # Low-entropy synthetic stream (BASELINE.json config): bytes < 16 so
    # FL frames pack at 4 bits — realistic compressible telemetry-ish data.
    host = rng.integers(0, 16, n, np.uint8)

    if args.method == "fl":
        npad = fl_jax.pad_to_frames(n)
        buf = np.zeros(npad, np.uint8)
        buf[:n] = host
        data = jax.device_put(jnp.asarray(buf))
        nn = jnp.int32(n)

        enc = jax.block_until_ready(fl_jax.fl_encode(data, nn))  # compile
        t_enc = _median_time(
            lambda: jax.block_until_ready(fl_jax.fl_encode(data, nn)),
            args.reps)
        bits, values = enc.bits, enc.values
        out = jax.block_until_ready(fl_jax.fl_decode(bits, values, nn))
        t_dec = _median_time(
            lambda: jax.block_until_ready(fl_jax.fl_decode(bits, values, nn)),
            args.reps)
        comp_bytes = int(enc.num_frames) + int(enc.values_size)
        ok = bool(np.array_equal(np.asarray(out)[:n], host))
    else:
        bucket = 1 << 20
        npad = -(-n // bucket) * bucket
        buf = np.zeros(npad, np.uint8)
        buf[:n] = host
        data = jax.device_put(jnp.asarray(buf))
        nn = jnp.int32(n)

        enc = jax.block_until_ready(rl_jax.rl_encode(data, nn))
        t_enc = _median_time(
            lambda: jax.block_until_ready(rl_jax.rl_encode(data, nn)),
            args.reps)
        r = enc.num_runs
        out = jax.block_until_ready(
            rl_jax.rl_decode(enc.counts, enc.values, r, nn, npad))
        t_dec = _median_time(
            lambda: jax.block_until_ready(
                rl_jax.rl_decode(enc.counts, enc.values, r, nn, npad)),
            args.reps)
        comp_bytes = 2 * int(enc.num_runs)
        ok = bool(np.array_equal(np.asarray(out)[:n], host))

    ratio = comp_bytes / n
    gb = n / 1e9
    enc_gbps = gb / t_enc
    dec_gbps = gb / t_dec
    agg_gbps = 2 * gb / (t_enc + t_dec)
    sol_gbps = hbm_gbps / (1.0 + ratio)

    if not args.json_only:
        print(f"# {args.method} size={args.size_mb}MiB ratio={ratio:.4f} "
              f"encode={enc_gbps:.1f} GB/s decode={dec_gbps:.1f} GB/s "
              f"roundtrip_ok={ok} sol={sol_gbps:.0f} GB/s",
              file=sys.stderr)
    if not ok:
        print(json.dumps({"metric": f"{args.method}_codec_throughput",
                          "value": 0.0, "unit": "GB/s", "vs_baseline": 0.0,
                          "error": "round-trip mismatch"}))
        return 1
    print(json.dumps({
        "metric": f"{args.method}_codec_throughput",
        "value": round(agg_gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(agg_gbps / sol_gbps, 4),
        "encode_gbps": round(enc_gbps, 2),
        "decode_gbps": round(dec_gbps, 2),
        "ratio": round(ratio, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
