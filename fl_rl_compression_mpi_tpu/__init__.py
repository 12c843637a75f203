"""TPU-native lossless compression framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the CUDA +
MPI + NCCL reference ``Polyphemus980/fl-rl-compression-MPI``:

* **FL** — fixed-length bit-packing: per-128-byte-frame minimal bit-width
  (segmented max-reduce) + dense LSB-first re-pack, bit-exact with the
  reference container format;
* **RL** — run-length coding (flag + scan compaction, 255-capped runs),
  implemented from the reference's written spec (it shipped no RL code);
* data-parallel scaling over a ``jax.sharding.Mesh`` with ``shard_map`` and
  XLA collectives replacing MPI point-to-point / NCCL AllGather;
* a C++ host runtime for the CPU golden paths (the reference's native CPU
  codec), bound via ctypes.

Layout: ``ops/`` device + host kernels, ``models/`` codec families,
``parallel/`` mesh/sharding/multi-host, ``utils/`` timers & runtime glue.
"""

__version__ = "0.1.0"

from .container import (  # noqa: F401
    FLCompressed,
    RLCompressed,
    load_fl,
    load_rl,
    save_fl,
    save_rl,
)
