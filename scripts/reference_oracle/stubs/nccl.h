// Minimal NCCL stub for the reference's mpi_common.cuh (only the comm
// handle type is needed by the host-only oracle build).
#ifndef FLRL_STUB_NCCL_H
#define FLRL_STUB_NCCL_H

typedef void* ncclComm_t;

#endif  // FLRL_STUB_NCCL_H
