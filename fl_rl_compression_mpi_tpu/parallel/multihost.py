"""Multi-host (pod-slice) driver.

The reference bootstraps multi-node runs with ``MPI_Init`` + an
``ncclUniqueId`` broadcast (``/root/reference/src/main.cu:35-70``), gives
each rank a disjoint file chunk (``file_io.cu:28-71``) and gathers
compressed payloads to rank 0 (``fl_gpu.cu:41-74`` MPI, ``:76-287`` NCCL).
TPU-native, the same roles map to:

* process bootstrap → :func:`jax.distributed.initialize` (coordinator
  address instead of mpirun; one process per host);
* per-rank file chunk → :func:`fileio.load_file_sharded` with the same
  frame-aligned split rule, then one more frame-aligned split across the
  host's local chips;
* metadata exchange (the reference's ``MPI_Allgather`` of sizes,
  ``fl_gpu.cu:101-106``) → ``multihost_utils.process_allgather`` over DCN;
* payload gather → host 0 pulls each process's compressed slice via a
  process-level allgather of the (worst-case padded) payload, then writes
  the container in rank order — concatenation is lossless because every
  chunk boundary is a frame multiple (SURVEY.md finding #3).

Single-process degenerate behavior is identical to `dist.compress_fl`,
which is what the test suite pins; multi-process paths follow the same code
shape and are exercised by the driver's dry-run compile.
"""

from __future__ import annotations

import numpy as np

import jax

from .. import container, fileio
from ..ops.bitpack import FRAME_LENGTH
from . import dist


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Bootstrap multi-process JAX (no-op when single-process args are
    absent and JAX was already initialized)."""
    if coordinator_address is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def _process_allgather(x: np.ndarray) -> np.ndarray:
    """Allgather a small host array across processes (DCN metadata path).
    Single-process: returns ``x[None]``."""
    if jax.process_count() == 1:
        return np.asarray(x)[None]
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x))


def compress_fl_file(input_path: str, output_path: str,
                     frame_length: int = FRAME_LENGTH,
                     bucket_frames: int = 8192) -> None:
    """Compress a shared input file across all hosts/chips; process 0
    writes the container."""
    nproc = jax.process_count()
    pid = jax.process_index()

    # Rank's chunk of the shared file (frame-aligned reference split).
    data, _ = fileio.load_file_sharded(input_path, pid, nproc, frame_length)
    total_size = np.int64(_file_size(input_path))

    # Local mesh over this process's chips; encode the local chunk
    # (each process is one "MPI rank" — its work must stay addressable).
    mesh = dist.make_local_mesh()
    comp = dist.compress_fl(np.asarray(data), mesh, frame_length,
                            bucket_frames)

    # Exchange per-process compressed sizes (MPI_Allgather analog), then
    # the payloads themselves, padded to the max size (the reference NCCL
    # path's max-padding trick, fl_gpu.cu:144-170, over DCN).
    sizes = _process_allgather(np.asarray(
        [comp.bits.size, comp.values.size, data.size], np.int64))
    if nproc == 1:
        merged = comp
    else:
        bmax = int(sizes[:, 0].max())
        vmax = int(sizes[:, 1].max())
        bpad = np.zeros(bmax, np.uint8)
        bpad[: comp.bits.size] = comp.bits
        vpad = np.zeros(vmax, np.uint8)
        vpad[: comp.values.size] = comp.values
        bits_all = _process_allgather(bpad)      # (P, bmax)
        vals_all = _process_allgather(vpad)      # (P, vmax)
        if pid != 0:
            return
        merged = container.FLCompressed(
            bits=np.concatenate(
                [bits_all[p, : sizes[p, 0]] for p in range(nproc)]),
            values=np.concatenate(
                [vals_all[p, : sizes[p, 1]] for p in range(nproc)]),
            input_size=int(sizes[:, 2].sum()))
    if pid == 0:
        assert int(total_size) == int(merged.input_size)
        container.save_fl(output_path, merged)


def _file_size(path: str) -> int:
    import os
    return os.path.getsize(path)


def compress_rl_file(input_path: str, output_path: str,
                     bucket_frames: int = 8192) -> None:
    """RL analog of :func:`compress_fl_file` — per-process chunk encode,
    size + payload exchange over DCN, process-0 container write.  Shard
    boundaries may split runs (lossless; documented distributed
    semantics)."""
    nproc = jax.process_count()
    pid = jax.process_index()
    data, _ = fileio.load_file_sharded(input_path, pid, nproc, FRAME_LENGTH)
    mesh = dist.make_local_mesh()
    comp = dist.compress_rl(np.asarray(data), mesh, bucket_frames)

    sizes = _process_allgather(np.asarray(
        [comp.counts.size, data.size], np.int64))
    if nproc == 1:
        merged = comp
    else:
        rmax = int(sizes[:, 0].max())
        cpad = np.zeros(rmax, np.uint8)
        cpad[: comp.counts.size] = comp.counts
        vpad = np.zeros(rmax, np.uint8)
        vpad[: comp.values.size] = comp.values
        counts_all = _process_allgather(cpad)
        vals_all = _process_allgather(vpad)
        if pid != 0:
            return
        merged = container.RLCompressed(
            counts=np.concatenate(
                [counts_all[p, : sizes[p, 0]] for p in range(nproc)]),
            values=np.concatenate(
                [vals_all[p, : sizes[p, 0]] for p in range(nproc)]),
            input_size=int(sizes[:, 1].sum()))
    if pid == 0:
        container.save_rl(output_path, merged)


def decompress_fl_file(input_path: str, output_path: str,
                       frame_length: int = FRAME_LENGTH,
                       bucket_frames: int = 8192) -> None:
    """Distributed decompression of a container file (the reference has no
    distributed decode at all).  Every process decodes the full container
    with its local chips; process 0 writes the output.  (A chunked
    per-process variant needs a sharded output file protocol, which the
    reference also lacks — single-writer keeps the CLI contract.)"""
    if jax.process_index() != 0:
        return
    comp = container.load_fl(input_path)
    out = dist.decompress_fl(comp, dist.make_local_mesh(), frame_length,
                             bucket_frames)
    fileio.save_file(output_path, out)
