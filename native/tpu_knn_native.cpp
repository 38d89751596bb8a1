// tpu_knn native runtime: host-side data loading, parsing and packing.
//
// The reference implements its entire IO layer in C++ (reference:
// include/read_data.h ReadVecDataEfficiently, src/space/space_vector.cc
// text/binary object readers, include/space/space_sparse_vector.h sparse
// parsers, include/thread_pool.h ParallelFor). On TPU the *device* path
// is XLA, but the host runtime around it — turning files and ragged
// user data into the padded device layouts — is the same kind of
// bandwidth-bound native code, so it lives here as a small C-ABI
// library used from Python via ctypes (pybind11 is not available in the
// build image).
//
// Functions return 0 on success, negative error codes otherwise. All
// output buffers are caller-allocated; sizing passes are provided where
// output sizes are data-dependent (two-phase protocol, mirroring the
// reference C ABI's get_size/fill pattern, nmslib_c.h).

#include <atomic>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Dense text reader: whitespace-separated floats, one vector per line.
// (ReadVecDataEfficiently analog, include/read_data.h:110-277.)
// ---------------------------------------------------------------------------

// Pass 1: count rows and columns. Returns 0, fills *rows/*cols.
// Inconsistent column counts -> -2; IO error -> -1.
int tk_dense_text_shape(const char* path, int64_t* rows, int64_t* cols) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  std::string line;
  char buf[1 << 16];
  int64_t r = 0, c = -1;
  std::string acc;
  while (fgets(buf, sizeof buf, f)) {
    acc += buf;
    if (!acc.empty() && acc.back() != '\n' && !feof(f)) continue;
    // count tokens
    int64_t n = 0;
    const char* p = acc.c_str();
    while (*p) {
      while (*p && std::isspace((unsigned char)*p)) ++p;
      if (!*p) break;
      ++n;
      while (*p && !std::isspace((unsigned char)*p)) ++p;
    }
    if (n > 0) {
      if (c < 0) c = n;
      else if (c != n) { fclose(f); return -2; }
      ++r;
    }
    acc.clear();
  }
  fclose(f);
  *rows = r;
  *cols = c < 0 ? 0 : c;
  return 0;
}

// Pass 2: parse into the caller's [rows, cols] float32 buffer, using
// nthreads workers over byte ranges split at line boundaries.
int tk_dense_text_read(const char* path, float* out, int64_t rows, int64_t cols,
                       int nthreads) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> data((size_t)sz + 1);
  if (sz > 0 && fread(data.data(), 1, (size_t)sz, f) != (size_t)sz) {
    fclose(f);
    return -1;
  }
  fclose(f);
  data[(size_t)sz] = '\0';

  // index line starts (single pass; cheap relative to float parsing)
  std::vector<const char*> lines;
  lines.reserve((size_t)rows);
  {
    const char* p = data.data();
    const char* end = data.data() + sz;
    while (p < end) {
      const char* q = p;
      while (q < end && *q != '\n') ++q;
      // non-blank?
      const char* t = p;
      while (t < q && std::isspace((unsigned char)*t)) ++t;
      if (t < q) lines.push_back(p);
      p = q + 1;
    }
  }
  if ((int64_t)lines.size() != rows) return -3;

  int nt = nthreads > 0 ? nthreads : (int)std::thread::hardware_concurrency();
  if (nt < 1) nt = 1;
  std::atomic<int> err{0};
  auto worker = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      char* p = const_cast<char*>(lines[(size_t)i]);
      for (int64_t j = 0; j < cols; ++j) {
        char* q = nullptr;
        float v = strtof(p, &q);
        if (q == p) { err.store(-4); return; }
        out[i * cols + j] = v;
        p = q;
      }
    }
  };
  std::vector<std::thread> ths;
  int64_t step = (rows + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t lo = t * step, hi = std::min<int64_t>(rows, lo + step);
    if (lo >= hi) break;
    ths.emplace_back(worker, lo, hi);
  }
  for (auto& th : ths) th.join();
  return err.load();
}

// ---------------------------------------------------------------------------
// Sparse text reader: "id:val id:val ..." per line, ids 1-based strictly
// increasing (the API contract, reference README.md:57 / lib.zig:728-738).
// ---------------------------------------------------------------------------

// Pass 1: rows, total nnz and max row nnz.
int tk_sparse_text_shape(const char* path, int64_t* rows, int64_t* total_nnz,
                         int64_t* max_nnz) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char buf[1 << 16];
  std::string acc;
  int64_t r = 0, tot = 0, mx = 0;
  while (fgets(buf, sizeof buf, f)) {
    acc += buf;
    if (!acc.empty() && acc.back() != '\n' && !feof(f)) continue;
    int64_t n = 0;
    for (const char* p = acc.c_str(); *p;) {
      while (*p && std::isspace((unsigned char)*p)) ++p;
      if (!*p) break;
      ++n;
      while (*p && !std::isspace((unsigned char)*p)) ++p;
    }
    if (n > 0) { ++r; tot += n; if (n > mx) mx = n; }
    acc.clear();
  }
  fclose(f);
  *rows = r; *total_nnz = tot; *max_nnz = mx;
  return 0;
}

// Pass 2: fill CSR arrays (row_len[rows], ids[total_nnz], vals[total_nnz]).
// Returns 0; -5 on malformed id:val; -6 on id-order violation.
int tk_sparse_text_read(const char* path, int32_t* row_len, int32_t* ids,
                        float* vals, int64_t rows) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char buf[1 << 16];
  std::string acc;
  int64_t r = 0, w = 0;
  while (fgets(buf, sizeof buf, f)) {
    acc += buf;
    if (!acc.empty() && acc.back() != '\n' && !feof(f)) continue;
    int64_t n = 0;
    long prev = 0;
    char* p = const_cast<char*>(acc.c_str());
    while (*p) {
      while (*p && std::isspace((unsigned char)*p)) ++p;
      if (!*p) break;
      char* q = nullptr;
      long id = strtol(p, &q, 10);
      if (q == p || *q != ':') { fclose(f); return -5; }
      p = q + 1;
      float v = strtof(p, &q);
      if (q == p) { fclose(f); return -5; }
      p = q;
      if (id < 1 || id <= prev) { fclose(f); return -6; }
      prev = id;
      ids[w] = (int32_t)id;
      vals[w] = v;
      ++w; ++n;
    }
    if (n > 0) { row_len[r] = (int32_t)n; ++r; }
    acc.clear();
  }
  fclose(f);
  return r == rows ? 0 : -3;
}

// ---------------------------------------------------------------------------
// Padded-CSR packer: ragged (concatenated) -> [n_pad, nnz_pad] device layout.
// This is the hot host loop of the sparse encode path (spaces/sparse.py
// _pack_csr); threaded like the reference's ParallelFor
// (include/thread_pool.h:61-115).
// ---------------------------------------------------------------------------
int tk_pack_csr(const int32_t* row_len, const int32_t* ids, const float* vals,
                int64_t rows, int64_t n_pad, int64_t nnz_pad,
                int32_t pad_col, int32_t* out_col, float* out_val,
                int32_t* out_len, int nthreads) {
  // prefix offsets
  std::vector<int64_t> off((size_t)rows + 1, 0);
  for (int64_t i = 0; i < rows; ++i) off[(size_t)i + 1] = off[(size_t)i] + row_len[i];

  int nt = nthreads > 0 ? nthreads : (int)std::thread::hardware_concurrency();
  if (nt < 1) nt = 1;
  auto worker = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      int64_t n = (i < rows) ? row_len[i] : 0;
      if (n > nnz_pad) n = nnz_pad;
      int32_t* oc = out_col + i * nnz_pad;
      float* ov = out_val + i * nnz_pad;
      if (i < rows) {
        memcpy(oc, ids + off[(size_t)i], (size_t)n * sizeof(int32_t));
        memcpy(ov, vals + off[(size_t)i], (size_t)n * sizeof(float));
      }
      for (int64_t j = n; j < nnz_pad; ++j) { oc[j] = pad_col; ov[j] = 0.0f; }
      if (out_len) out_len[i] = (int32_t)n;
    }
  };
  std::vector<std::thread> ths;
  int64_t step = (n_pad + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t lo = t * step, hi = std::min<int64_t>(n_pad, lo + step);
    if (lo >= hi) break;
    ths.emplace_back(worker, lo, hi);
  }
  for (auto& th : ths) th.join();
  return 0;
}

// ---------------------------------------------------------------------------
// String packer: ragged byte strings -> [n_pad, l_max] i32 matrix + lengths
// (the string encode path, spaces/string.py _pack_strings).
// ---------------------------------------------------------------------------
int tk_pack_strings(const uint8_t* bytes, const int64_t* offsets, int64_t rows,
                    int64_t n_pad, int64_t l_max, int32_t* out_chars,
                    int32_t* out_len, int nthreads) {
  int nt = nthreads > 0 ? nthreads : (int)std::thread::hardware_concurrency();
  if (nt < 1) nt = 1;
  auto worker = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      int64_t n = (i < rows) ? offsets[i + 1] - offsets[i] : 0;
      if (n > l_max) n = l_max;
      int32_t* oc = out_chars + i * l_max;
      const uint8_t* src = bytes + (i < rows ? offsets[i] : 0);
      for (int64_t j = 0; j < n; ++j) oc[j] = (int32_t)src[j];
      for (int64_t j = n; j < l_max; ++j) oc[j] = 0;
      if (out_len) out_len[i] = (int32_t)n;
    }
  };
  std::vector<std::thread> ths;
  int64_t step = (n_pad + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t lo = t * step, hi = std::min<int64_t>(n_pad, lo + step);
    if (lo >= hi) break;
    ths.emplace_back(worker, lo, hi);
  }
  for (auto& th : ths) th.join();
  return 0;
}

// ---------------------------------------------------------------------------
// Host Levenshtein (reference: src/distcomp_edist.cc) — used as a gold
// oracle for the device DP kernel and for host-side dedup tooling.
// ---------------------------------------------------------------------------
int tk_levenshtein(const uint8_t* a, int64_t la, const uint8_t* b, int64_t lb) {
  if (la == 0) return (int)lb;
  if (lb == 0) return (int)la;
  std::vector<int> prev((size_t)la + 1), cur((size_t)la + 1);
  for (int64_t j = 0; j <= la; ++j) prev[(size_t)j] = (int)j;
  for (int64_t i = 1; i <= lb; ++i) {
    cur[0] = (int)i;
    for (int64_t j = 1; j <= la; ++j) {
      int cost = (a[j - 1] == b[i - 1]) ? 0 : 1;
      int v = prev[(size_t)j] + 1;
      if (cur[(size_t)j - 1] + 1 < v) v = cur[(size_t)j - 1] + 1;
      if (prev[(size_t)j - 1] + cost < v) v = prev[(size_t)j - 1] + cost;
      cur[(size_t)j] = v;
    }
    std::swap(prev, cur);
  }
  return prev[(size_t)la];
}

// ---------------------------------------------------------------------------
// fvecs/bvecs/ivecs readers: the standard ANN benchmark binary format
// (SIFT-1M, GIST, GloVe conversions) — each record is
// [dim:int32][dim * elem] with elem f32 (fvecs), u8 (bvecs) or i32
// (ivecs). The reference reads its vector data through
// ReadVecDataEfficiently (include/read_data.h); these are the binary
// counterparts, threaded over record stripes.
// ---------------------------------------------------------------------------

// Pass 1: rows and dim. -1 IO error, -2 malformed (size not a whole
// number of records or non-positive dim).
int tk_vecs_shape(const char* path, int64_t elem_size, int64_t* rows,
                  int64_t* dim) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int32_t d = 0;
  if (fread(&d, 4, 1, f) != 1 || d <= 0) { fclose(f); return -2; }
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fclose(f);
  int64_t rec = 4 + (int64_t)d * elem_size;
  if (sz % rec != 0) return -2;
  *rows = sz / rec;
  *dim = d;
  return 0;
}

// Pass 2: strided copy into the caller's [rows, dim] element buffer,
// validating every record's dim field. -3 row-count mismatch, -4 dim
// mismatch mid-file.
int tk_vecs_read(const char* path, int64_t elem_size, void* out,
                 int64_t rows, int64_t dim, int nthreads) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  int64_t rec = 4 + dim * elem_size;
  if (sz != rows * rec) { fclose(f); return -3; }
  std::vector<char> data((size_t)sz);
  if (sz > 0 && fread(data.data(), 1, (size_t)sz, f) != (size_t)sz) {
    fclose(f);
    return -1;
  }
  fclose(f);

  int nt = nthreads > 0 ? nthreads : (int)std::thread::hardware_concurrency();
  if (nt < 1) nt = 1;
  std::atomic<int> err{0};
  auto worker = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const char* p = data.data() + i * rec;
      int32_t d;
      memcpy(&d, p, 4);
      if (d != dim) { err.store(-4); return; }
      memcpy((char*)out + i * dim * elem_size, p + 4,
             (size_t)(dim * elem_size));
    }
  };
  std::vector<std::thread> ths;
  int64_t step = (rows + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t lo = t * step, hi = std::min<int64_t>(rows, lo + step);
    if (lo >= hi) break;
    ths.emplace_back(worker, lo, hi);
  }
  for (auto& th : ths) th.join();
  return err.load();
}

// Binary object-vector persistence (WriteObjectVectorBinData /
// ReadObjectVectorFromBinData analog, include/space.h:223-231): a tiny
// header + raw rows. Kept trivial: Python memory-maps through numpy; the
// native side provides the version/magic contract.
static const uint32_t kMagic = 0x544b4e4eu;  // "TKNN"

int tk_bin_write_header(FILE* f, uint32_t dtype, int64_t rows, int64_t cols) {
  if (fwrite(&kMagic, 4, 1, f) != 1) return -1;
  if (fwrite(&dtype, 4, 1, f) != 1) return -1;
  if (fwrite(&rows, 8, 1, f) != 1) return -1;
  if (fwrite(&cols, 8, 1, f) != 1) return -1;
  return 0;
}

int tk_version() { return 1; }

}  // extern "C"
