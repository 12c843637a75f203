// Minimal MPI stub so the reference's host-only CPU codec + container I/O
// (/root/reference/src/fl/fl_cpu.cu, src/file_io.cu) compile with g++
// without an MPI installation.  Only the symbols referenced by
// fl_common.cuh's send/receive helpers are declared; the oracle driver
// never calls them (single-process compress/decompress only).
#ifndef FLRL_STUB_MPI_H
#define FLRL_STUB_MPI_H

#include <cstddef>

typedef int MPI_Comm;
typedef int MPI_Datatype;
struct MPI_Status {
  int MPI_SOURCE, MPI_TAG, MPI_ERROR;
};

#define MPI_SUCCESS 0
#define MPI_COMM_WORLD 0
#define MPI_UNSIGNED_LONG 1
#define MPI_UNSIGNED_CHAR 2

inline int MPI_Comm_rank(MPI_Comm, int* rank) { *rank = 0; return 0; }
inline int MPI_Send(const void*, int, MPI_Datatype, int, int, MPI_Comm) {
  return 0;
}
inline int MPI_Recv(void*, int, MPI_Datatype, int, int, MPI_Comm,
                    MPI_Status*) {
  return 0;
}

#endif  // FLRL_STUB_MPI_H
