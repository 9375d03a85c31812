// Native host-side hot paths for chromosome3d_tpu.
//
// The reference's host layer is Perl text munging (chromosome3D.pl:110-206):
// at L=456 the whitespace float matrix is ~2 MB of text parsed cell by cell.
// This library provides a single-pass zero-copy parser (mmap'd, no line
// splitting) plus a PDB ATOM-row emitter, exposed through a minimal C ABI
// consumed via ctypes (chromosome3d_tpu/native/__init__.py). Python remains
// the fallback when the library isn't built.
//
// Build: make -C chromosome3d_tpu/native

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct MappedFile {
  const char* data = nullptr;
  size_t size = 0;
  int fd = -1;

  bool open(const char* path) {
    fd = ::open(path, O_RDONLY);
    if (fd < 0) return false;
    struct stat st;
    if (fstat(fd, &st) != 0 || st.st_size == 0) {
      ::close(fd);
      fd = -1;
      return false;
    }
    size = static_cast<size_t>(st.st_size);
    void* p = mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
    if (p == MAP_FAILED) {
      ::close(fd);
      fd = -1;
      return false;
    }
    data = static_cast<const char*>(p);
    return true;
  }

  ~MappedFile() {
    if (data) munmap(const_cast<char*>(data), size);
    if (fd >= 0) ::close(fd);
  }
};

inline bool is_space(char c) {
  return c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\v' || c == '\f';
}

// Parse all whitespace-separated doubles in [p, end). Writes up to cap
// values into out (out may be null to count only). Returns the count.
int64_t parse_doubles(const char* p, const char* end, double* out, int64_t cap) {
  int64_t n = 0;
  while (p < end) {
    while (p < end && is_space(*p)) ++p;
    if (p >= end) break;
    char* next = nullptr;
    double v = strtod(p, &next);
    if (next == p) {  // not a number: skip the token
      while (p < end && !is_space(*p)) ++p;
      continue;
    }
    if (out) {
      if (n >= cap) return -1;
      out[n] = v;
    }
    ++n;
    p = next;
  }
  return n;
}

}  // namespace

extern "C" {

// Total count of float cells in the file (L*L for a well-formed matrix).
int64_t c3d_matrix_size(const char* path) {
  MappedFile f;
  if (!f.open(path)) return -1;
  return parse_doubles(f.data, f.data + f.size, nullptr, 0);
}

// Fill out[0..n) with the file's cells; returns the number written or -1.
int64_t c3d_parse_matrix(const char* path, double* out, int64_t n) {
  MappedFile f;
  if (!f.open(path)) return -1;
  return parse_doubles(f.data, f.data + f.size, out, n);
}

// Emit a CA-bead PDB (same fixed-column layout as io/pdb.py write_ca_pdb,
// ATOM rows + CONECT chain + END). Returns 0 on success.
int32_t c3d_write_ca_pdb(const char* path, const double* xyz, int64_t L) {
  FILE* fp = fopen(path, "w");
  if (!fp) return -1;
  for (int64_t i = 0; i < L; ++i) {
    fprintf(fp,
            "ATOM  %5lld  CA  MET  %4lld    %8.3f%8.3f%8.3f  1.00  0.00      "
            "     C  \n",
            static_cast<long long>(i + 1), static_cast<long long>(i + 1),
            xyz[3 * i], xyz[3 * i + 1], xyz[3 * i + 2]);
  }
  for (int64_t i = 1; i < L; ++i) {
    fprintf(fp, "CONECT%5lld%5lld\n", static_cast<long long>(i),
            static_cast<long long>(i + 1));
  }
  fputs("END\n", fp);
  fclose(fp);
  return 0;
}

}  // extern "C"
