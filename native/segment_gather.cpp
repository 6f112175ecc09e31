// Native batch-assembly kernels for the host data path.
//
// The reference assembles batches in Python DataLoader workers (6 processes,
// pickling tensors across process boundaries) [ref: speech_decoding/utils/
// get_dataloaders.py:70-85]. Here batch assembly is a multithreaded C++
// gather over the memory-resident preprocessed arrays: for each batch item,
// copy a (C, L) window starting at a per-item time offset out of a per-item
// source array into one contiguous (B, C, L) batch buffer. ctypes releases
// the GIL for the call, so a Python-level prefetch thread overlaps assembly
// with device compute (see speech_decoding_tpu/data/native_loader.py).
//
// Build: g++ -O3 -shared -fPIC -o libsegment_gather.so segment_gather.cpp -lpthread

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Gather B segments: out[b, c, :] = srcs[b][c * src_T[b] + onsets[b] ... +L]
// srcs:   B pointers to (C, src_T[b]) row-major float arrays
// onsets: B time offsets (must satisfy onsets[b] + L <= src_T[b])
// out:    (B, C, L) row-major
void sd_gather_segments(const float** srcs, const int64_t* src_T,
                        const int64_t* onsets, int64_t B, int64_t C, int64_t L,
                        float* out, int num_threads) {
  if (num_threads <= 0) {
    num_threads = (int)std::thread::hardware_concurrency();
    if (num_threads <= 0) num_threads = 4;
  }
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    for (;;) {
      int64_t b = next.fetch_add(1);
      if (b >= B) return;
      const float* src = srcs[b];
      const int64_t T = src_T[b];
      const int64_t onset = onsets[b];
      float* dst = out + b * C * L;
      for (int64_t c = 0; c < C; ++c) {
        std::memcpy(dst + c * L, src + c * T + onset, (size_t)L * sizeof(float));
      }
    }
  };
  std::vector<std::thread> threads;
  int n = (int)std::min<int64_t>(num_threads, B);
  threads.reserve(n);
  for (int i = 0; i < n; ++i) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

// Same gather fused with per-(b, c) baseline correction: subtract the mean of
// the first baseline_len samples of each copied window (the collator's first
// stage [ref: gwilliams2022.py:658]). Robust scaling stays on device (it
// needs sorts, which the TPU does faster than the host).
void sd_gather_segments_baseline(const float** srcs, const int64_t* src_T,
                                 const int64_t* onsets, int64_t B, int64_t C,
                                 int64_t L, int64_t baseline_len, float* out,
                                 int num_threads) {
  if (num_threads <= 0) {
    num_threads = (int)std::thread::hardware_concurrency();
    if (num_threads <= 0) num_threads = 4;
  }
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    for (;;) {
      int64_t b = next.fetch_add(1);
      if (b >= B) return;
      const float* src = srcs[b];
      const int64_t T = src_T[b];
      const int64_t onset = onsets[b];
      float* dst = out + b * C * L;
      for (int64_t c = 0; c < C; ++c) {
        const float* row = src + c * T + onset;
        float* drow = dst + c * L;
        double acc = 0.0;
        for (int64_t t = 0; t < baseline_len; ++t) acc += row[t];
        const float base = baseline_len > 0 ? (float)(acc / baseline_len) : 0.0f;
        for (int64_t t = 0; t < L; ++t) drow[t] = row[t] - base;
      }
    }
  };
  std::vector<std::thread> threads;
  int n = (int)std::min<int64_t>(num_threads, B);
  threads.reserve(n);
  for (int i = 0; i < n; ++i) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

}  // extern "C"
