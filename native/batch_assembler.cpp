// Parallel random-crop batch assembly for the training input pipeline.
//
// The Python batcher's slice-copy loop peaks around 230 batches/s
// single-threaded under the GIL (data/collate.py). This native assembler
// copies all four feature windows for a batch with OpenMP-style threads
// (plain std::thread — no runtime deps), releasing the GIL for the whole
// assembly. The reference's counterpart is the torch DataLoader worker
// pool + Python collater (train_fastsvc.py:438-557).
//
// Build: via native/Makefile (libbatch.so); ctypes binding in
// svcc23_fastsvc_tpu/data/native_batch.py.

#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// All arrays are float32, C-contiguous.
//   audio_src (N, L_src), f0_src (N, F_src), ppg_src (N, F_src, D),
//   lft_src (N, L_src)
//   rows (B,), starts (B,) — int64 frame starts
// Outputs: audio (B, L), f0 (B, F), ppg (B, F, D), lft (B, L)
// where L = F * hop.
int assemble_fastsvc_batch(
    const float* audio_src, const float* f0_src, const float* ppg_src,
    const float* lft_src, long n_src, long l_src, long f_src, long ppg_dim,
    const long* rows, const long* starts, long batch, long frames, long hop,
    float* audio_out, float* f0_out, float* ppg_out, float* lft_out,
    int n_threads) {
  const long L = frames * hop;
  if (n_threads < 1) n_threads = 1;

  auto work = [&](long b0, long b1) {
    for (long b = b0; b < b1; ++b) {
      const long r = rows[b];
      const long fs = starts[b];
      const long ss = fs * hop;
      if (r < 0 || r >= n_src) continue;
      std::memcpy(audio_out + b * L, audio_src + r * l_src + ss,
                  sizeof(float) * size_t(L));
      std::memcpy(f0_out + b * frames, f0_src + r * f_src + fs,
                  sizeof(float) * size_t(frames));
      std::memcpy(ppg_out + b * frames * ppg_dim,
                  ppg_src + (r * f_src + fs) * ppg_dim,
                  sizeof(float) * size_t(frames * ppg_dim));
      std::memcpy(lft_out + b * L, lft_src + r * l_src + ss,
                  sizeof(float) * size_t(L));
    }
  };

  if (n_threads == 1 || batch < 4) {
    work(0, batch);
    return 0;
  }
  std::vector<std::thread> threads;
  const long per = (batch + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const long b0 = t * per;
    const long b1 = std::min(batch, b0 + per);
    if (b0 >= b1) break;
    threads.emplace_back(work, b0, b1);
  }
  for (auto& th : threads) th.join();
  return 0;
}

}  // extern "C"
