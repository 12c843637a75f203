"""Benchmark matrix driver — the `on_cluster.sh` analog.

The reference's only benchmark harness is a SLURM script running
``mpirun ./compress c {fl-nccl, fl-mpi}`` over {512, 2048, 3124} MB inputs
on 3 DGX nodes and eyeballing ``logs/*.log``
(``/root/reference/on_cluster.sh:18-34``).  This driver reproduces the same
matrix natively: synthetic inputs of the same sizes, every codec method, one
process (the chip is claimed once), structured JSONL results.

Usage:
    python scripts/bench_matrix.py [--sizes-mb 512 2048 3124]
        [--methods fl fl-dist rl] [--out logs/bench_matrix.jsonl]

On a single-chip host the distributed methods run with every shard on the
one chip (still exercising the full shard/merge path); on a pod slice they
spread over all chips automatically.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes-mb", type=int, nargs="+",
                    default=[512, 2048, 3124])
    ap.add_argument("--methods", nargs="+",
                    default=["fl", "fl-dist", "fl-ici", "rl"])
    ap.add_argument("--out", default="logs/bench_matrix.jsonl")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from fl_rl_compression_mpi_tpu.cli import _enable_compile_cache
    from fl_rl_compression_mpi_tpu.ops import fl_jax, rl_jax
    from fl_rl_compression_mpi_tpu.parallel import dist
    _enable_compile_cache()

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    results = []
    for size_mb in args.sizes_mb:
        n = size_mb * (1 << 20)
        rng = np.random.default_rng(size_mb)
        host = rng.integers(0, 16, n, np.uint8)  # low-entropy (4-bit frames)
        for method in args.methods:
            t_enc = t_dec = None
            try:
                if method == "fl":
                    npad = fl_jax.pad_to_frames(n)
                    buf = np.zeros(npad, np.uint8)
                    buf[:n] = host
                    d = jax.device_put(jnp.asarray(buf))
                    nn = jnp.int32(n)
                    jax.block_until_ready(fl_jax.fl_encode(d, nn))
                    ts = []
                    for _ in range(args.reps):
                        t0 = time.perf_counter()
                        enc = jax.block_until_ready(fl_jax.fl_encode(d, nn))
                        ts.append(time.perf_counter() - t0)
                    t_enc = float(np.median(ts))
                    jax.block_until_ready(
                        fl_jax.fl_decode(enc.bits, enc.values, nn))
                    ts = []
                    for _ in range(args.reps):
                        t0 = time.perf_counter()
                        jax.block_until_ready(
                            fl_jax.fl_decode(enc.bits, enc.values, nn))
                        ts.append(time.perf_counter() - t0)
                    t_dec = float(np.median(ts))
                elif method in ("fl-dist", "fl-ici"):
                    mesh = dist.make_mesh()
                    ndev = mesh.devices.size
                    plan = dist.plan_shards(n, ndev)
                    d2 = jax.device_put(
                        jnp.asarray(dist.shard_host_data(host, plan)))
                    ns = jnp.asarray(plan.ns, jnp.int32)
                    fn = (dist.fl_compress_sharded if method == "fl-dist"
                          else dist.fl_compress_merged)
                    jax.block_until_ready(fn(mesh, d2, ns))
                    ts = []
                    for _ in range(args.reps):
                        t0 = time.perf_counter()
                        jax.block_until_ready(fn(mesh, d2, ns))
                        ts.append(time.perf_counter() - t0)
                    t_enc = float(np.median(ts))
                elif method == "rl":
                    bucket = 1 << 20
                    npad = -(-n // bucket) * bucket
                    buf = np.zeros(npad, np.uint8)
                    buf[:n] = host
                    d = jax.device_put(jnp.asarray(buf))
                    nn = jnp.int32(n)
                    jax.block_until_ready(rl_jax.rl_encode(d, nn))
                    ts = []
                    for _ in range(args.reps):
                        t0 = time.perf_counter()
                        enc = jax.block_until_ready(rl_jax.rl_encode(d, nn))
                        ts.append(time.perf_counter() - t0)
                    t_enc = float(np.median(ts))
                    jax.block_until_ready(rl_jax.rl_decode(
                        enc.counts, enc.values, enc.num_runs, nn, npad))
                    ts = []
                    for _ in range(args.reps):
                        t0 = time.perf_counter()
                        jax.block_until_ready(rl_jax.rl_decode(
                            enc.counts, enc.values, enc.num_runs, nn, npad))
                        ts.append(time.perf_counter() - t0)
                    t_dec = float(np.median(ts))
                else:
                    raise ValueError(method)
                rec = {"method": method, "size_mb": size_mb,
                       "encode_gbps": round(n / 1e9 / t_enc, 2)}
                if t_dec:
                    rec["decode_gbps"] = round(n / 1e9 / t_dec, 2)
            except (MemoryError, RuntimeError) as e:
                rec = {"method": method, "size_mb": size_mb,
                       "error": str(e)[:200]}
            results.append(rec)
            print(json.dumps(rec), flush=True)
        del host
    with open(args.out, "a") as f:
        for rec in results:
            f.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
