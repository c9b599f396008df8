// Parallel random-crop batch assembly for the training input pipeline.
//
// The Python batcher's slice-copy loop peaks around 230 batches/s
// single-threaded under the GIL (data/collate.py). This native assembler
// copies all four feature windows for a batch with OpenMP-style threads
// (plain std::thread — no runtime deps), releasing the GIL for the whole
// assembly. The reference's counterpart is the torch DataLoader worker
// pool + Python collater (train_fastsvc.py:438-557).
//
// Two entry points:
//   assemble_fastsvc_batch — one-shot batch copy (Python draws the crops);
//   producer_start/next/release/stop — a fully native producer loop: C++
//     worker threads own the crop RNG, the window assembly, and a ring of
//     pre-allocated slots, so the feeding side of training never takes the
//     GIL at all (the Python consumer just hands out filled slots).
//
// Build: via native/Makefile (libbatch.so); ctypes binding in
// svcc23_fastsvc_tpu/data/native_batch.py.

#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
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

// ---------------------------------------------------------------------------
// Native producer loop.
//
// Python pre-allocates one contiguous buffer per feature with a leading
// `depth` slot axis (audio (depth, B, L), f0 (depth, B, F), ppg
// (depth, B, F, D), lft (depth, B, L), emb (depth, B, E), plus rows/starts
// (depth, B) int64 so tests can audit exactly which crops were drawn).
// Worker threads claim EMPTY slots, draw (row, start) crops with a
// per-thread splitmix64 stream (deterministic per seed; the slot interleave
// across threads is not, matching data/prefetch.BatcherPool semantics), fill
// the slot, and queue it FULL. The consumer blocks in producer_next for the
// next FULL slot and returns it via producer_release once the batch has been
// consumed.

namespace {

struct SplitMix64 {
  uint64_t s;
  explicit SplitMix64(uint64_t seed) : s(seed) {}
  uint64_t next() {
    uint64_t z = (s += 0x9e3779b97f4a7c15ULL);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
  }
  double uniform() {  // [0, 1)
    return double(next() >> 11) * (1.0 / 9007199254740992.0);
  }
};

struct Producer {
  // packed source store (borrowed; Python keeps it alive)
  const float* audio_src;
  const float* f0_src;
  const float* ppg_src;
  const float* lft_src;
  const float* emb_src;  // may be null
  const long* n_frames;
  long n_src, l_src, f_src, ppg_dim, emb_dim;
  // batch geometry
  long batch, frames, hop, acw;
  // slot buffers (borrowed)
  float *audio_out, *f0_out, *ppg_out, *lft_out, *emb_out;
  long* rows_out;
  long* starts_out;
  long depth;

  std::mutex mu;
  std::condition_variable cv_worker;  // EMPTY slot available / stopping
  std::condition_variable cv_consumer;  // FULL slot queued / stopping
  std::vector<int> state;  // 0 EMPTY, 1 FILLING, 2 FULL
  std::deque<long> full;
  bool stopping = false;
  std::vector<std::thread> workers;

  void fill_slot(long slot, SplitMix64& rng) {
    const long B = batch, F = frames, L = frames * hop;
    long* rows = rows_out + slot * B;
    long* starts = starts_out + slot * B;
    for (long b = 0; b < B; ++b) {
      const long r = long(rng.next() % uint64_t(n_src));
      const long max_start = n_frames[r] - F;
      // same draw form as the Python batcher: acw + U[0,1) * (max_start-acw)
      const long st = acw + long(rng.uniform() * double(max_start - acw));
      rows[b] = r;
      starts[b] = st;
    }
    float* audio = audio_out + slot * B * L;
    float* f0 = f0_out + slot * B * F;
    float* ppg = ppg_out + slot * B * F * ppg_dim;
    float* lft = lft_out + slot * B * L;
    for (long b = 0; b < B; ++b) {
      const long r = rows[b], fs = starts[b], ss = fs * hop;
      std::memcpy(audio + b * L, audio_src + r * l_src + ss,
                  sizeof(float) * size_t(L));
      std::memcpy(f0 + b * F, f0_src + r * f_src + fs,
                  sizeof(float) * size_t(F));
      std::memcpy(ppg + b * F * ppg_dim, ppg_src + (r * f_src + fs) * ppg_dim,
                  sizeof(float) * size_t(F * ppg_dim));
      std::memcpy(lft + b * L, lft_src + r * l_src + ss,
                  sizeof(float) * size_t(L));
      if (emb_src && emb_out)
        std::memcpy(emb_out + (slot * B + b) * emb_dim,
                    emb_src + r * emb_dim, sizeof(float) * size_t(emb_dim));
    }
  }

  void worker(uint64_t seed) {
    SplitMix64 rng(seed);
    for (;;) {
      long slot = -1;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_worker.wait(lk, [&] {
          if (stopping) return true;
          for (long s = 0; s < depth; ++s)
            if (state[s] == 0) return true;
          return false;
        });
        if (stopping) return;
        for (long s = 0; s < depth; ++s)
          if (state[s] == 0) {
            slot = s;
            state[s] = 1;
            break;
          }
      }
      fill_slot(slot, rng);
      {
        std::lock_guard<std::mutex> lk(mu);
        if (stopping) return;
        state[slot] = 2;
        full.push_back(slot);
      }
      cv_consumer.notify_one();
    }
  }
};

}  // namespace

extern "C" {

// Returns an opaque handle (or null on bad args). All buffers are borrowed:
// the caller must keep the source store and the slot buffers alive until
// producer_stop returns. emb_src/emb_out may be null (no speaker embedding).
void* producer_start(
    const float* audio_src, const float* f0_src, const float* ppg_src,
    const float* lft_src, const float* emb_src, const long* n_frames,
    long n_src, long l_src, long f_src, long ppg_dim, long emb_dim,
    long batch, long frames, long hop, long acw,
    float* audio_out, float* f0_out, float* ppg_out, float* lft_out,
    float* emb_out, long* rows_out, long* starts_out,
    long depth, int n_threads, unsigned long long seed) {
  if (n_src <= 0 || depth <= 0 || batch <= 0 || n_threads < 1) return nullptr;
  auto* p = new Producer();
  p->audio_src = audio_src;
  p->f0_src = f0_src;
  p->ppg_src = ppg_src;
  p->lft_src = lft_src;
  p->emb_src = emb_src;
  p->n_frames = n_frames;
  p->n_src = n_src;
  p->l_src = l_src;
  p->f_src = f_src;
  p->ppg_dim = ppg_dim;
  p->emb_dim = emb_dim;
  p->batch = batch;
  p->frames = frames;
  p->hop = hop;
  p->acw = acw;
  p->audio_out = audio_out;
  p->f0_out = f0_out;
  p->ppg_out = ppg_out;
  p->lft_out = lft_out;
  p->emb_out = emb_out;
  p->rows_out = rows_out;
  p->starts_out = starts_out;
  p->depth = depth;
  p->state.assign(size_t(depth), 0);
  for (int t = 0; t < n_threads; ++t)
    p->workers.emplace_back(&Producer::worker, p,
                            seed + 0x9e3779b97f4a7c15ULL * uint64_t(t + 1));
  return p;
}

// Blocks until a FULL slot is available; returns its index, or -1 if the
// producer is stopping.
long producer_next(void* h) {
  auto* p = static_cast<Producer*>(h);
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_consumer.wait(lk, [&] { return p->stopping || !p->full.empty(); });
  if (p->full.empty()) return -1;
  const long slot = p->full.front();
  p->full.pop_front();
  return slot;
}

// Marks a slot consumed so workers can refill it.
void producer_release(void* h, long slot) {
  auto* p = static_cast<Producer*>(h);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    if (slot < 0 || slot >= p->depth) return;
    p->state[size_t(slot)] = 0;
  }
  p->cv_worker.notify_one();
}

// Joins all workers and frees the handle. Safe to call once.
void producer_stop(void* h) {
  auto* p = static_cast<Producer*>(h);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->stopping = true;
  }
  p->cv_worker.notify_all();
  p->cv_consumer.notify_all();
  for (auto& th : p->workers) th.join();
  delete p;
}

}  // extern "C"
