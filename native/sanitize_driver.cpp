// Sanitizer stress driver for the native components (race detection).
//
// The framework's only first-party concurrency lives in native/: the
// threaded Harvest band analysis (harvest.cpp) and the GIL-free batch
// producer ring (batch_assembler.cpp). The reference has nothing to
// sanitize (pure Python, single-threaded training — SURVEY.md §5 "race
// detection: none"); this framework does, so it ships a harness.
//
// Build + run via `make -C native sanitize`: the same sources are compiled
// directly into this driver twice — once with -fsanitize=thread and once
// with -fsanitize=address,undefined — and executed. Exit code is nonzero
// on any sanitizer report (halt_on_error) or on a data-integrity failure
// (torn slot writes would corrupt batches even if they didn't race).
//
// The scenarios deliberately use a shallow slot ring and more workers than
// slots to maximise contention on the EMPTY/FULL state machine, and tear
// the producer down mid-flight (stop while workers are filling), which is
// exactly the path a training-loop crash takes.

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {
int harvest_f0(const double* x_in, long length, double fs, double f0_floor,
               double f0_ceil, double frame_period_ms, double* f0_out,
               long n_frames_cap);
int assemble_fastsvc_batch(
    const float* audio_src, const float* f0_src, const float* ppg_src,
    const float* lft_src, long n_src, long l_src, long f_src, long ppg_dim,
    const long* rows, const long* starts, long batch, long frames, long hop,
    float* audio_out, float* f0_out, float* ppg_out, float* lft_out,
    int n_threads);
void* producer_start(
    const float* audio_src, const float* f0_src, const float* ppg_src,
    const float* lft_src, const float* emb_src, const long* n_frames,
    long n_src, long l_src, long f_src, long ppg_dim, long emb_dim,
    long batch, long frames, long hop, long acw,
    float* audio_out, float* f0_out, float* ppg_out, float* lft_out,
    float* emb_out, long* rows_out, long* starts_out,
    long depth, int n_threads, unsigned long long seed);
long producer_next(void* h);
void producer_release(void* h, long slot);
void producer_stop(void* h);
}

namespace {

int failures = 0;

void check(bool ok, const char* what) {
  if (!ok) {
    std::fprintf(stderr, "FAIL: %s\n", what);
    ++failures;
  }
}

// Source store: values encode (row, position) so torn/misplaced copies are
// detectable by value.
struct Store {
  long n_src, f_src, hop, ppg_dim, emb_dim;
  long l_src;
  std::vector<float> audio, f0, ppg, lft, emb;
  std::vector<long> n_frames;

  Store(long n, long f, long h, long d, long e)
      : n_src(n), f_src(f), hop(h), ppg_dim(d), emb_dim(e), l_src(f * h) {
    audio.resize(size_t(n * l_src));
    lft.resize(size_t(n * l_src));
    f0.resize(size_t(n * f));
    ppg.resize(size_t(n * f * d));
    emb.resize(size_t(n * e));
    n_frames.assign(size_t(n), f);
    for (long r = 0; r < n; ++r) {
      for (long i = 0; i < l_src; ++i) {
        audio[size_t(r * l_src + i)] = float(r * 1000 + i % 997);
        lft[size_t(r * l_src + i)] = float(r * 2000 + i % 991);
      }
      for (long i = 0; i < f; ++i) f0[size_t(r * f + i)] = float(r * 100 + i);
      for (long i = 0; i < f * d; ++i)
        ppg[size_t(r * f * d + i)] = float(r * 10 + i % 983);
      for (long i = 0; i < e; ++i) emb[size_t(r * e + i)] = float(r * 7 + i);
    }
  }
};

// Verify one filled slot against the store using the recorded rows/starts.
bool verify_slot(const Store& s, long batch, long frames,
                 const float* audio, const float* f0, const float* ppg,
                 const float* lft, const float* emb, const long* rows,
                 const long* starts) {
  const long L = frames * s.hop;
  for (long b = 0; b < batch; ++b) {
    const long r = rows[b], fs = starts[b], ss = fs * s.hop;
    if (r < 0 || r >= s.n_src) return false;
    if (fs < 0 || fs + frames > s.f_src) return false;
    if (std::memcmp(audio + b * L, s.audio.data() + r * s.l_src + ss,
                    sizeof(float) * size_t(L)) != 0)
      return false;
    if (std::memcmp(f0 + b * frames, s.f0.data() + r * s.f_src + fs,
                    sizeof(float) * size_t(frames)) != 0)
      return false;
    if (std::memcmp(ppg + b * frames * s.ppg_dim,
                    s.ppg.data() + (r * s.f_src + fs) * s.ppg_dim,
                    sizeof(float) * size_t(frames * s.ppg_dim)) != 0)
      return false;
    if (std::memcmp(lft + b * L, s.lft.data() + r * s.l_src + ss,
                    sizeof(float) * size_t(L)) != 0)
      return false;
    if (emb && std::memcmp(emb + b * s.emb_dim, s.emb.data() + r * s.emb_dim,
                           sizeof(float) * size_t(s.emb_dim)) != 0)
      return false;
  }
  return true;
}

// --------------------------------------------------------------------------
// Scenario 1: harvest_f0 — internally threaded band analysis, plus two
// concurrent top-level calls (the preprocess CLI shards utterances across
// processes, but the binding must still be re-entrant).
// --------------------------------------------------------------------------
void scenario_harvest() {
  const double fs = 16000.0;
  const long n = 16000;  // 1 s
  auto run_one = [&](double hz) {
    std::vector<double> x(static_cast<size_t>(n));
    for (long i = 0; i < n; ++i) {
      double t = double(i) / fs;
      x[size_t(i)] = std::sin(2 * M_PI * hz * t) +
                     0.3 * std::sin(2 * M_PI * 2 * hz * t);
    }
    const long cap = n / 80 + 2;
    std::vector<double> f0(size_t(cap), 0.0);
    int rc = harvest_f0(x.data(), n, fs, 70.0, 800.0, 5.0, f0.data(), cap);
    check(rc == 0, "harvest_f0 rc");
    long voiced = 0;
    double acc = 0;
    for (double v : f0)
      if (v > 0) {
        ++voiced;
        acc += v;
      }
    check(voiced > 50, "harvest_f0 voiced frames");
    if (voiced) check(std::fabs(acc / double(voiced) - hz) < hz * 0.05,
                      "harvest_f0 mean within 5%");
  };
  std::thread a(run_one, 220.0);
  std::thread b(run_one, 330.0);
  run_one(440.0);
  a.join();
  b.join();
  std::fprintf(stderr, "scenario_harvest done\n");
}

// --------------------------------------------------------------------------
// Scenario 2: one-shot assembler at high thread count, verified by value.
// --------------------------------------------------------------------------
void scenario_assemble() {
  Store s(6, 200, 4, 8, 0);
  const long batch = 32, frames = 25;
  const long L = frames * s.hop;
  std::vector<long> rows(static_cast<size_t>(batch));
  std::vector<long> starts(static_cast<size_t>(batch));
  for (long b = 0; b < batch; ++b) {
    rows[size_t(b)] = b % s.n_src;
    starts[size_t(b)] = (b * 37) % (s.f_src - frames);
  }
  std::vector<float> audio(size_t(batch * L)), f0(size_t(batch * frames)),
      ppg(size_t(batch * frames * s.ppg_dim)), lft(size_t(batch * L));
  int rc = assemble_fastsvc_batch(
      s.audio.data(), s.f0.data(), s.ppg.data(), s.lft.data(), s.n_src,
      s.l_src, s.f_src, s.ppg_dim, rows.data(), starts.data(), batch, frames,
      s.hop, audio.data(), f0.data(), ppg.data(), lft.data(), 8);
  check(rc == 0, "assemble rc");
  check(verify_slot(s, batch, frames, audio.data(), f0.data(), ppg.data(),
                    lft.data(), nullptr, rows.data(), starts.data()),
        "assemble content");
  std::fprintf(stderr, "scenario_assemble done\n");
}

// --------------------------------------------------------------------------
// Scenario 3: producer ring under contention — more workers than slots, a
// consumer that verifies every batch by value, many iterations.
// --------------------------------------------------------------------------
void scenario_producer_contended() {
  Store s(5, 120, 4, 6, 16);
  const long batch = 8, frames = 30, acw = 2, depth = 3;
  const int workers = 6;
  const long L = frames * s.hop;
  std::vector<float> audio(size_t(depth * batch * L)),
      f0(size_t(depth * batch * frames)),
      ppg(size_t(depth * batch * frames * s.ppg_dim)),
      lft(size_t(depth * batch * L)), emb(size_t(depth * batch * s.emb_dim));
  std::vector<long> rows(size_t(depth * batch)), starts(size_t(depth * batch));
  void* h = producer_start(
      s.audio.data(), s.f0.data(), s.ppg.data(), s.lft.data(), s.emb.data(),
      s.n_frames.data(), s.n_src, s.l_src, s.f_src, s.ppg_dim, s.emb_dim,
      batch, frames, s.hop, acw, audio.data(), f0.data(), ppg.data(),
      lft.data(), emb.data(), rows.data(), starts.data(), depth, workers,
      0x5eedULL);
  check(h != nullptr, "producer_start");
  if (!h) return;
  for (int it = 0; it < 400; ++it) {
    long slot = producer_next(h);
    check(slot >= 0 && slot < depth, "producer_next slot range");
    if (slot < 0) break;
    bool ok = verify_slot(
        s, batch, frames, audio.data() + slot * batch * L,
        f0.data() + slot * batch * frames,
        ppg.data() + slot * batch * frames * s.ppg_dim,
        lft.data() + slot * batch * L, emb.data() + slot * batch * s.emb_dim,
        rows.data() + slot * batch, starts.data() + slot * batch);
    check(ok, "producer slot content");
    for (long b = 0; b < batch; ++b)
      check(starts[size_t(slot * batch + b)] >= acw, "crop start >= acw");
    producer_release(h, slot);
  }
  producer_stop(h);
  std::fprintf(stderr, "scenario_producer_contended done\n");
}

// --------------------------------------------------------------------------
// Scenario 4: mid-flight teardown under the binding's contract
// (data/native_batch.py: one consumer thread owns producer_next /
// producer_release / producer_stop). The race that CAN happen in real use
// is stop-vs-worker-fill: close() while worker threads are mid-memcpy into
// EMPTY→FILLING slots (the crash-save path in train/loop.py tears the
// producer down at an arbitrary point). Consume k ∈ {0, 1, 3} batches then
// stop immediately; k=0 is the instant-teardown-after-start case.
// --------------------------------------------------------------------------
void scenario_producer_teardown() {
  Store s(4, 100, 4, 4, 0);
  const long batch = 16, frames = 40, depth = 2;
  const long L = frames * s.hop;
  std::vector<float> audio(size_t(depth * batch * L)),
      f0(size_t(depth * batch * frames)),
      ppg(size_t(depth * batch * frames * s.ppg_dim)),
      lft(size_t(depth * batch * L));
  std::vector<long> rows(size_t(depth * batch)), starts(size_t(depth * batch));
  for (int round = 0; round < 30; ++round) {
    void* h = producer_start(
        s.audio.data(), s.f0.data(), s.ppg.data(), s.lft.data(), nullptr,
        s.n_frames.data(), s.n_src, s.l_src, s.f_src, s.ppg_dim, 0, batch,
        frames, s.hop, 0, audio.data(), f0.data(), ppg.data(), lft.data(),
        nullptr, rows.data(), starts.data(), depth, 4,
        0xabcULL + uint64_t(round));
    check(h != nullptr, "producer_start teardown");
    if (!h) return;
    const int k = round % 3 == 0 ? 0 : (round % 3 == 1 ? 1 : 3);
    for (int i = 0; i < k; ++i) {
      long slot = producer_next(h);
      check(slot >= 0 && slot < depth, "teardown slot range");
      if (slot < 0) break;
      producer_release(h, slot);
    }
    producer_stop(h);  // workers may be mid-fill on the other slots
  }
  std::fprintf(stderr, "scenario_producer_teardown done\n");
}

}  // namespace

int main() {
  scenario_harvest();
  scenario_assemble();
  scenario_producer_contended();
  scenario_producer_teardown();
  if (failures) {
    std::fprintf(stderr, "%d failure(s)\n", failures);
    return 1;
  }
  std::fprintf(stderr, "all scenarios passed\n");
  return 0;
}
