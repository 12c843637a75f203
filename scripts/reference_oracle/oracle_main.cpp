// Driver for the reference's own CPU codec, compiled host-only.
//
// This is OUR code; it links against the reference sources compiled
// in place from /root/reference (never copied into this repo):
//   src/fl/fl_cpu.cu        — cpuCompress / cpuDecompress
//   src/file_io.cu          — loadFile / saveCompressedFL / loadCompressedFL
//   src/timers/cpu_timer.cu — timer the above insist on
//
// Purpose (VERDICT r1, "What's missing" #1): produce *truly independent*
// golden containers — bytes written by the reference implementation
// itself — so our bit-exactness tests are not pinned to our own NumPy
// re-derivation of the format.
//
// Usage: ref_oracle c <in> <out>   compress raw -> FL container
//        ref_oracle d <in> <out>   decompress FL container -> raw

#include <cstdio>
#include <cstring>

#include "file_io.cuh"
#include "fl/fl_cpu.cuh"

int main(int argc, char** argv) {
  if (argc != 4 || (strcmp(argv[1], "c") && strcmp(argv[1], "d"))) {
    fprintf(stderr, "usage: %s c|d <in> <out>\n", argv[0]);
    return 2;
  }
  try {
    if (!strcmp(argv[1], "c")) {
      FileIO::FileData in = FileIO::loadFile(argv[2]);
      FixedLength::FLCompressed comp =
          FixedLength::cpuCompress(in.data, in.size);
      comp.inputSize = in.size;  // cpuCompress leaves it to the caller
      FileIO::saveCompressedFL(argv[3], comp);
    } else {
      FixedLength::FLCompressed comp = FileIO::loadCompressedFL(argv[2]);
      FixedLength::FLDecompressed out = FixedLength::cpuDecompress(
          comp.inputSize, comp.outputBits, comp.bitsSize,
          comp.outputValues, comp.valuesSize);
      FileIO::saveFile(argv[3], FileIO::FileData(out));
    }
  } catch (const std::exception& e) {
    fprintf(stderr, "[ERROR] %s\n", e.what());
    return 1;
  }
  return 0;
}
