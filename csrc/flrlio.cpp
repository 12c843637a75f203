// Native host runtime for the TPU FL/RL compression framework.
//
// Re-expresses the reference's host-side C++ (file I/O: /root/reference/
// src/file_io.cu; CPU codec: src/fl/fl_cpu.cu) as an original,
// OpenMP-parallel shared library with a plain C ABI consumed from Python
// via ctypes.  The kernels' semantics are pinned by the Python golden
// implementations and the differential test suite; this library exists so
// the host paths (file staging, container writes, CPU fallback codec) run
// at memory/disk speed instead of interpreter speed.
//
// Design notes (vs the reference, which is sequential on host):
//  * FL frames are independent and full frames are byte-aligned for
//    frame lengths divisible by 8 (SURVEY.md finding #3), so both encode
//    passes and the whole decode parallelize over frames after one cheap
//    serial prefix scan of per-frame byte counts.
//  * All sizes are int64 (the reference's `int` chunk math overflows past
//    2 GB, file_io.cu:46-51 — fixed, not replicated).
//  * Bit packing uses a 64-bit accumulator per frame, LSB-first within
//    bytes — the container layout of file_io.cu:236-273.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

inline int required_bits(uint8_t v) {
  int b = 32 - __builtin_clz(static_cast<uint32_t>(v) | 1u);
  return b;  // >= 1 by construction (floor of 1 for zero bytes)
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// File I/O
// ---------------------------------------------------------------------------

int64_t flrl_file_size(const char* path) {
  struct stat st;
  if (stat(path, &st) != 0) return -1;
  return static_cast<int64_t>(st.st_size);
}

// Read [off, off+len) of the file into out.  Returns 0 on success.
int flrl_read_range(const char* path, int64_t off, int64_t len,
                    uint8_t* out) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
#ifdef POSIX_FADV_SEQUENTIAL
  posix_fadvise(fd, off, len, POSIX_FADV_SEQUENTIAL);
#endif
  int64_t done = 0;
  while (done < len) {
    ssize_t r = pread(fd, out + done, static_cast<size_t>(len - done),
                      static_cast<off_t>(off + done));
    if (r < 0) { close(fd); return -2; }
    if (r == 0) break;  // EOF
    done += r;
  }
  close(fd);
  return done == len ? 0 : -3;
}

int flrl_read_file(const char* path, uint8_t* out, int64_t cap) {
  int64_t sz = flrl_file_size(path);
  if (sz < 0 || sz > cap) return -1;
  return flrl_read_range(path, 0, sz, out);
}

int flrl_write_file(const char* path, const uint8_t* buf, int64_t len) {
  int fd = open(path, O_WRONLY | O_CREAT | O_TRUNC, 0644);
  if (fd < 0) return -1;
  int64_t done = 0;
  while (done < len) {
    ssize_t w = write(fd, buf + done, static_cast<size_t>(len - done));
    if (w < 0) { close(fd); return -2; }
    done += w;
  }
  close(fd);
  return 0;
}

// Container write: [input u64][asz u64][bsz u64][a bytes][b bytes]
// (the reference FL layout, file_io.cu:236-273; RL uses the same shape).
int flrl_write_container(const char* path, uint64_t input_size,
                         const uint8_t* a, uint64_t asz,
                         const uint8_t* b, uint64_t bsz) {
  int fd = open(path, O_WRONLY | O_CREAT | O_TRUNC, 0644);
  if (fd < 0) return -1;
  uint64_t hdr[3] = {input_size, asz, bsz};
  struct Piece { const uint8_t* p; uint64_t n; };
  Piece pieces[3] = {{reinterpret_cast<const uint8_t*>(hdr), sizeof hdr},
                     {a, asz}, {b, bsz}};
  for (const Piece& pc : pieces) {
    uint64_t done = 0;
    while (done < pc.n) {
      ssize_t w = write(fd, pc.p + done, static_cast<size_t>(pc.n - done));
      if (w < 0) { close(fd); return -2; }
      done += static_cast<uint64_t>(w);
    }
  }
  close(fd);
  return 0;
}

// ---------------------------------------------------------------------------
// FL codec (host fallback / golden-speed path)
// ---------------------------------------------------------------------------

// bits_out: ceil(n/L) bytes.  values_out capacity: n + L (worst case).
// Returns values_size, or -1 on bad args.
int64_t flrl_fl_encode(const uint8_t* data, int64_t n, int frame_len,
                       uint8_t* bits_out, uint8_t* values_out) {
  if (n < 0 || frame_len <= 0 || frame_len % 8 != 0) return -1;
  if (n == 0) return 0;
  const int64_t frames = (n + frame_len - 1) / frame_len;

  // Pass 1: per-frame bit widths (parallel; frames are independent).
#pragma omp parallel for schedule(static)
  for (int64_t f = 0; f < frames; ++f) {
    const int64_t lo = f * frame_len;
    const int64_t hi = lo + frame_len < n ? lo + frame_len : n;
    uint8_t m = 0;
    for (int64_t i = lo; i < hi; ++i) m = data[i] > m ? data[i] : m;
    bits_out[f] = static_cast<uint8_t>(required_bits(m));
  }

  // Serial exclusive scan of per-frame byte counts (full frames are
  // byte-aligned because 8 | frame_len — finding #3).
  int64_t values_size = 0;
  // offsets computed on the fly in pass 2 via a second scan; store base per
  // frame in a stack-free way: recompute with a parallel-friendly blocked
  // scan.  frames is at most n/L; one serial pass over it is cheap.
  int64_t* offs = new int64_t[frames + 1];
  offs[0] = 0;
  for (int64_t f = 0; f < frames; ++f) {
    const int64_t lo = f * frame_len;
    const int64_t hi = lo + frame_len < n ? lo + frame_len : n;
    offs[f + 1] = offs[f] + (static_cast<int64_t>(bits_out[f]) * (hi - lo) + 7) / 8;
  }
  values_size = offs[frames];

  // Pass 2: pack each frame at its width (parallel, disjoint output).
#pragma omp parallel for schedule(static)
  for (int64_t f = 0; f < frames; ++f) {
    const int b = bits_out[f];
    const int64_t lo = f * frame_len;
    const int64_t hi = lo + frame_len < n ? lo + frame_len : n;
    uint8_t* out = values_out + offs[f];
    uint64_t acc = 0;
    int accbits = 0;
    int64_t w = 0;
    for (int64_t i = lo; i < hi; ++i) {
      acc |= static_cast<uint64_t>(data[i]) << accbits;
      accbits += b;
      while (accbits >= 8) {
        out[w++] = static_cast<uint8_t>(acc & 0xFF);
        acc >>= 8;
        accbits -= 8;
      }
    }
    if (accbits > 0) out[w++] = static_cast<uint8_t>(acc & 0xFF);
  }
  delete[] offs;
  return values_size;
}

// Returns 0 on success.
int flrl_fl_decode(const uint8_t* bits, int64_t frames,
                   const uint8_t* values, int64_t values_size, int frame_len,
                   uint8_t* out, int64_t n) {
  if (n < 0 || frame_len <= 0 || frame_len % 8 != 0) return -1;
  if (n == 0) return 0;
  if (frames != (n + frame_len - 1) / frame_len) return -2;

  int64_t* offs = new int64_t[frames + 1];
  offs[0] = 0;
  for (int64_t f = 0; f < frames; ++f) {
    const int64_t lo = f * frame_len;
    const int64_t hi = lo + frame_len < n ? lo + frame_len : n;
    offs[f + 1] = offs[f] + (static_cast<int64_t>(bits[f]) * (hi - lo) + 7) / 8;
  }
  if (offs[frames] > values_size) { delete[] offs; return -3; }

#pragma omp parallel for schedule(static)
  for (int64_t f = 0; f < frames; ++f) {
    const int b = bits[f];
    const uint64_t mask = (1u << b) - 1u;
    const int64_t lo = f * frame_len;
    const int64_t hi = lo + frame_len < n ? lo + frame_len : n;
    const uint8_t* in = values + offs[f];
    uint64_t acc = 0;
    int accbits = 0;
    int64_t r = 0;
    for (int64_t i = lo; i < hi; ++i) {
      while (accbits < b) {
        acc |= static_cast<uint64_t>(in[r++]) << accbits;
        accbits += 8;
      }
      out[i] = static_cast<uint8_t>(acc & mask);
      acc >>= b;
      accbits -= b;
    }
  }
  delete[] offs;
  return 0;
}

// ---------------------------------------------------------------------------
// RL codec (host fallback)
// ---------------------------------------------------------------------------

// counts_out/values_out capacity: n.  Returns run count R.
int64_t flrl_rl_encode(const uint8_t* data, int64_t n,
                       uint8_t* counts_out, uint8_t* values_out) {
  if (n <= 0) return 0;
  int64_t r = 0;
  uint8_t cur = data[0];
  int64_t len = 1;
  for (int64_t i = 1; i <= n; ++i) {
    if (i < n && data[i] == cur && len < 255) {
      ++len;
    } else {
      counts_out[r] = static_cast<uint8_t>(len);
      values_out[r] = cur;
      ++r;
      if (i < n) { cur = data[i]; len = 1; }
    }
  }
  return r;
}

// Returns decoded size, or -1 if it would exceed cap.
int64_t flrl_rl_decode(const uint8_t* counts, const uint8_t* values,
                       int64_t r, uint8_t* out, int64_t cap) {
  int64_t n = 0;
  for (int64_t i = 0; i < r; ++i) n += counts[i];
  if (n > cap) return -1;
  // Parallel fill: compute chunked offsets then memset per run.
  int64_t off = 0;
  for (int64_t i = 0; i < r; ++i) {
    memset(out + off, values[i], static_cast<size_t>(counts[i]));
    off += counts[i];
  }
  return n;
}

}  // extern "C"
