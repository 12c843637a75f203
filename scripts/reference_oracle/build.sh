#!/bin/sh
# Build the reference CPU codec host-only (no CUDA, no MPI, no NCCL) as an
# independent golden-file oracle.  Reference sources are compiled straight
# from /root/reference (read-only); stub headers satisfy the MPI/NCCL
# includes; __device__/__host__ qualifiers compile away.
set -e
HERE=$(dirname "$0")
REF=${REF:-/root/reference}
OUT=${1:-/tmp/ref_oracle}
# flrl_prelude.h: nvcc implicitly provides <cstring> and global min/max
g++ -O2 -std=c++17 -x c++ \
  -I "$HERE/stubs" -I "$REF/src" \
  "-D__device__=" "-D__host__=" -include "$HERE/stubs/flrl_prelude.h" \
  "$HERE/oracle_main.cpp" \
  "$REF/src/fl/fl_cpu.cu" \
  "$REF/src/file_io.cu" \
  "$REF/src/timers/cpu_timer.cu" \
  "$REF/src/timers/cpu_timer_with_transfer.cu" \
  -o "$OUT"
echo "built $OUT"
