"""Local multi-process launcher — the single-machine ``mpirun`` analog.

The reference launches with ``mpirun -np N ./compress ...``
(``/root/reference/on_cluster.sh:18-34``).  TPU-native multi-host runs use
one process per host with ``jax.distributed``; this helper spawns N such
processes on ONE machine (CPU backend) so the full multi-host code path —
bootstrap, sharded file reads, sizes-only exchange, rank-ordered streaming
merge — runs and can be validated without a pod.

Usage:
    python scripts/launch_multihost.py -np 4 c fl <in> <out>
(extra CLI args pass through, e.g. --frame-length)
"""

import argparse
import os
import socket
import subprocess
import sys


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-np", type=int, default=2, help="number of processes")
    ap.add_argument("rest", nargs=argparse.REMAINDER,
                    help="CLI args: <c|d> <method> <in> <out> [...]")
    args = ap.parse_args()
    if not args.rest:
        ap.error("missing CLI args")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    env = dict(os.environ, PYTHONPATH=repo, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, "-m", "fl_rl_compression_mpi_tpu", *args.rest,
         "--coordinator", f"localhost:{port}",
         "--num-processes", str(args.np), "--process-id", str(i)],
        env=env) for i in range(args.np)]
    rc = 0
    for p in procs:
        rc |= p.wait()
    return rc


if __name__ == "__main__":
    sys.exit(main())
