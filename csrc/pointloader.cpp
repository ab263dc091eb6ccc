// Native data-loading runtime for fullysparsefusion_tpu.
//
// The reference leans on torch DataLoader worker processes for its host-side
// pipeline (point .bin decode, per-sweep rigid transforms, concatenation);
// here the hot host path is a small C++ library driven through ctypes:
//   * zero-copy .bin reads into caller-provided buffers;
//   * fused rigid transform + time-lag channel append for sweep aggregation;
//   * multi-threaded batch loading that fills one fixed-capacity
//     [points_cap, dim] buffer per batch (padding discipline matches the
//     PointBatch container).
//
// Build: make -C csrc   (produces libfsfloader.so; loaded by data/native.py)
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Number of float32 elements in the file, or -1 on error.
long long fsf_file_num_floats(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long long bytes = std::ftell(f);
  std::fclose(f);
  return bytes / 4;
}

// Read up to max_floats float32s; returns count read or -1.
long long fsf_read_floats(const char* path, float* out, long long max_floats) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  long long n = (long long)std::fread(out, 4, (size_t)max_floats, f);
  std::fclose(f);
  return n;
}

// xyz' = R(3x3) @ xyz + t; remaining channels copied; dt appended.
// in: [n, in_dim] -> out: [n, in_dim + 1]
void fsf_transform_sweep(const float* in, long long n, int in_dim,
                         const float* rot3x3, const float* trans3, float dt,
                         float* out) {
  int out_dim = in_dim + 1;
  for (long long i = 0; i < n; ++i) {
    const float* p = in + i * in_dim;
    float* q = out + i * out_dim;
    for (int r = 0; r < 3; ++r) {
      q[r] = rot3x3[r * 3 + 0] * p[0] + rot3x3[r * 3 + 1] * p[1] +
             rot3x3[r * 3 + 2] * p[2] + trans3[r];
    }
    for (int c = 3; c < in_dim; ++c) q[c] = p[c];
    q[in_dim] = dt;
  }
}

// Range filter in place semantics: compacts rows whose xyz lies inside
// [lo, hi); returns new row count.
long long fsf_filter_range(float* pts, long long n, int dim, const float* lo,
                           const float* hi) {
  long long w = 0;
  for (long long i = 0; i < n; ++i) {
    const float* p = pts + i * dim;
    bool ok = true;
    for (int a = 0; a < 3; ++a) ok &= (p[a] >= lo[a]) && (p[a] < hi[a]);
    if (ok) {
      if (w != i) std::memcpy(pts + w * dim, p, sizeof(float) * dim);
      ++w;
    }
  }
  return w;
}

struct BatchJob {
  const char* path;
  const float* rot;    // 3x3 or nullptr (identity)
  const float* trans;  // 3 or nullptr
  float dt;
  int sample_index;    // which batch element this sweep belongs to
};

// Multi-threaded batch fill. paths/rots/etc are parallel arrays of n_jobs
// sweeps. Output: points [cap, out_dim], batch_idx [cap], valid count via
// return. out_dim = in_dim + 1 (dt channel). Jobs whose points overflow the
// cap are truncated (front-packed, same as the python collator).
long long fsf_load_batch(const char** paths, const float* rots,
                         const float* transs, const float* dts,
                         const int* sample_idx, int n_jobs, int in_dim,
                         float* out_points, int* out_batch, long long cap,
                         int n_threads) {
  int out_dim = in_dim + 1;
  std::vector<std::vector<float>> buffers(n_jobs);
  std::atomic<int> next{0};

  auto worker = [&]() {
    for (;;) {
      int j = next.fetch_add(1);
      if (j >= n_jobs) break;
      long long nf = fsf_file_num_floats(paths[j]);
      if (nf <= 0) continue;
      long long n = nf / in_dim;
      std::vector<float> raw((size_t)(n * in_dim));
      if (fsf_read_floats(paths[j], raw.data(), n * in_dim) <= 0) continue;
      buffers[j].resize((size_t)(n * out_dim));
      static const float I[9] = {1, 0, 0, 0, 1, 0, 0, 0, 1};
      static const float Z[3] = {0, 0, 0};
      const float* R = rots ? rots + j * 9 : I;
      const float* T = transs ? transs + j * 3 : Z;
      fsf_transform_sweep(raw.data(), n, in_dim, R, T, dts ? dts[j] : 0.0f,
                          buffers[j].data());
    }
  };

  std::vector<std::thread> ts;
  int nt = n_threads > 0 ? n_threads : 4;
  for (int t = 0; t < nt; ++t) ts.emplace_back(worker);
  for (auto& t : ts) t.join();

  long long cursor = 0;
  for (int j = 0; j < n_jobs && cursor < cap; ++j) {
    long long n = (long long)(buffers[j].size() / out_dim);
    long long take = std::min(n, cap - cursor);
    std::memcpy(out_points + cursor * out_dim, buffers[j].data(),
                sizeof(float) * (size_t)(take * out_dim));
    for (long long i = 0; i < take; ++i) out_batch[cursor + i] = sample_idx[j];
    cursor += take;
  }
  return cursor;
}

}  // extern "C"
