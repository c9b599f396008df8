// Harvest-style F0 estimation (Morise 2017) — native implementation.
//
// The reference uses pyworld.harvest (C++ WORLD behind cython,
// /root/reference/harana/bin/preprocess_fastsvc.py:41-57). This is a
// from-scratch implementation of the same algorithm family, written for the
// framework's C ABI (ctypes binding in svcc23_fastsvc_tpu/dsp/harvest.py):
//
//   1. candidate generation: the signal is low-pass filtered at log-spaced
//      boundary frequencies (24 bands/octave); for each band, four event
//      sequences (negative/positive zero crossings, peaks, dips) yield
//      interval-based instantaneous F0 contours; a candidate exists where
//      the four contours agree,
//   2. per-frame scoring and selection of the most reliable candidate,
//   3. contour fixing: short-segment removal and octave-jump suppression,
//   4. refinement of voiced frames by parabolic instantaneous-frequency
//      fitting on the fundamental.
//
// Serial heuristic DSP — deliberately native rather than XLA (SURVEY.md §2
// native item 1): data-dependent control flow per frame, no batching.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libharvest.so harvest.cpp

#include <cmath>
#include <complex>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

// ---------------------------------------------------------------------------
// Minimal iterative radix-2 FFT (power-of-two sizes only).
// ---------------------------------------------------------------------------
void fft_inplace(std::vector<std::complex<double>>& a, bool inverse) {
  const size_t n = a.size();
  for (size_t i = 1, j = 0; i < n; ++i) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    const double ang = 2 * kPi / double(len) * (inverse ? 1 : -1);
    const std::complex<double> wlen(std::cos(ang), std::sin(ang));
    for (size_t i = 0; i < n; i += len) {
      std::complex<double> w(1);
      for (size_t k = 0; k < len / 2; ++k) {
        std::complex<double> u = a[i + k];
        std::complex<double> v = a[i + k + len / 2] * w;
        a[i + k] = u + v;
        a[i + k + len / 2] = u - v;
        w *= wlen;
      }
    }
  }
  if (inverse) {
    for (auto& x : a) x /= double(n);
  }
}

size_t next_pow2(size_t n) {
  size_t p = 1;
  while (p < n) p <<= 1;
  return p;
}

// Nuttall window (WORLD uses it for its filters).
double nuttall(double x /* 0..1 */) {
  return 0.355768 - 0.487396 * std::cos(2 * kPi * x) +
         0.144232 * std::cos(4 * kPi * x) - 0.012604 * std::cos(6 * kPi * x);
}

// ---------------------------------------------------------------------------
// Event-interval F0 contour: times/values of instantaneous F0 from the
// intervals between successive events, linearly interpolated at frame times.
// ---------------------------------------------------------------------------
struct Contour {
  std::vector<double> t;   // event mid-times (s)
  std::vector<double> f0;  // 1 / interval
};

void interp_at(const Contour& c, const std::vector<double>& times,
               std::vector<double>& out) {
  const size_t n = c.t.size();
  out.assign(times.size(), 0.0);
  if (n < 2) return;
  size_t j = 0;
  for (size_t i = 0; i < times.size(); ++i) {
    const double x = times[i];
    if (x < c.t.front() || x > c.t.back()) continue;
    while (j + 2 < n && c.t[j + 1] < x) ++j;
    while (j > 0 && c.t[j] > x) --j;
    const double t0 = c.t[j], t1 = c.t[j + 1];
    const double w = (t1 > t0) ? (x - t0) / (t1 - t0) : 0.0;
    out[i] = c.f0[j] + w * (c.f0[j + 1] - c.f0[j]);
  }
}

// Events of one type from a filtered signal.
Contour zero_crossings(const std::vector<double>& y, double fs, bool negative) {
  Contour c;
  std::vector<double> ev;
  for (size_t i = 1; i < y.size(); ++i) {
    const double a = negative ? y[i - 1] : -y[i - 1];
    const double b = negative ? y[i] : -y[i];
    if (a > 0 && b <= 0) {
      const double frac = a / (a - b);  // linear sub-sample crossing
      ev.push_back((double(i - 1) + frac) / fs);
    }
  }
  for (size_t i = 1; i < ev.size(); ++i) {
    const double dt = ev[i] - ev[i - 1];
    if (dt > 0) {
      c.t.push_back(0.5 * (ev[i] + ev[i - 1]));
      c.f0.push_back(1.0 / dt);
    }
  }
  return c;
}

Contour extrema(const std::vector<double>& y, double fs, bool peaks) {
  Contour c;
  std::vector<double> ev;
  for (size_t i = 1; i + 1 < y.size(); ++i) {
    const bool hit = peaks ? (y[i] > y[i - 1] && y[i] >= y[i + 1])
                           : (y[i] < y[i - 1] && y[i] <= y[i + 1]);
    if (hit) ev.push_back(double(i) / fs);
  }
  for (size_t i = 1; i < ev.size(); ++i) {
    const double dt = ev[i] - ev[i - 1];
    if (dt > 0) {
      c.t.push_back(0.5 * (ev[i] + ev[i - 1]));
      c.f0.push_back(1.0 / dt);
    }
  }
  return c;
}

}  // namespace

extern "C" {

// Harvest-style F0. x: input signal; f0_out: n_frames = length/hop + 1.
// Returns 0 on success.
int harvest_f0(const double* x_in, long length, double fs, double f0_floor,
               double f0_ceil, double frame_period_ms, double* f0_out,
               long n_frames_cap) {
  if (length <= 0 || fs <= 0) return 1;
  const long hop = lround(fs * frame_period_ms / 1000.0);
  const long n_frames = length / hop + 1;
  if (n_frames > n_frames_cap) return 2;

  std::vector<double> x(x_in, x_in + length);

  // frame times
  std::vector<double> times(n_frames);
  for (long i = 0; i < n_frames; ++i) times[i] = double(i * hop) / fs;

  // FFT of the signal once; band-pass filters applied in frequency domain.
  const size_t nfft = next_pow2(size_t(length) + size_t(fs / f0_floor) * 4);
  std::vector<std::complex<double>> X(nfft);
  for (long i = 0; i < length; ++i) X[size_t(i)] = x[size_t(i)];
  fft_inplace(X, false);

  // candidate boundary frequencies: 24 per octave
  std::vector<double> bands;
  const double step = std::pow(2.0, 1.0 / 24.0);
  for (double bf = f0_floor; bf <= f0_ceil * 1.1; bf *= step) bands.push_back(bf);

  struct Cand {
    double f0;
    double score;  // lower is better (relative deviation)
  };
  const size_t ulen = static_cast<size_t>(length);
  const size_t uframes = static_cast<size_t>(n_frames);
  std::vector<std::vector<Cand>> cands{};
  cands.resize(uframes);

  // band analysis is embarrassingly parallel: each band filters the
  // spectrum and extracts event contours independently; candidates are
  // written to per-band slots and merged after the join.
  const size_t n_bands = bands.size();
  std::vector<std::vector<std::vector<Cand>>> band_cands(n_bands);
  unsigned hw = std::thread::hardware_concurrency();
  const int n_threads = hw ? int(hw > 4 ? 4 : hw) : 1;

  auto analyze_band = [&](size_t bi) {
    const double bf = bands[bi];
    std::vector<std::complex<double>> Y(nfft);
    std::vector<double> y(ulen);
    std::vector<double> est[4];
    band_cands[bi].assign(uframes, {});
    // low-pass at ~1.5*bf with a Nuttall-shaped rolloff: keeps the
    // fundamental of components near bf, removes higher harmonics.
    const double cutoff = bf * 1.5;
    const double roll = bf * 1.0;  // transition width
    for (size_t k = 0; k < nfft; ++k) {
      const double freq =
          (k <= nfft / 2 ? double(k) : double(k) - double(nfft)) * fs /
          double(nfft);
      const double af = std::fabs(freq);
      double g;
      if (af <= cutoff) {
        g = 1.0;
      } else if (af >= cutoff + roll) {
        g = 0.0;
      } else {
        g = nuttall(0.5 + 0.5 * (1.0 - (af - cutoff) / roll));
      }
      // also a gentle high-pass below bf/2 to suppress slow drift
      if (af < bf * 0.5) g *= af / (bf * 0.5);
      Y[k] = X[k] * g;
    }
    fft_inplace(Y, true);
    for (long i = 0; i < length; ++i) y[size_t(i)] = Y[size_t(i)].real();

    Contour c0 = zero_crossings(y, fs, true);
    Contour c1 = zero_crossings(y, fs, false);
    Contour c2 = extrema(y, fs, true);
    Contour c3 = extrema(y, fs, false);
    interp_at(c0, times, est[0]);
    interp_at(c1, times, est[1]);
    interp_at(c2, times, est[2]);
    interp_at(c3, times, est[3]);

    for (long i = 0; i < n_frames; ++i) {
      double m = 0, cnt = 0;
      for (int e = 0; e < 4; ++e) {
        const double v = est[e][size_t(i)];
        if (v > 0) {
          m += v;
          cnt += 1;
        }
      }
      if (cnt < 4) continue;
      m /= cnt;
      if (m < f0_floor * 0.9 || m > f0_ceil * 1.1) continue;
      // band must actually bracket the estimate
      if (m < bf * 0.5 || m > bf * 1.6) continue;
      double var = 0;
      for (int e = 0; e < 4; ++e) {
        const double d = est[e][size_t(i)] - m;
        var += d * d;
      }
      const double dev = std::sqrt(var / 4.0) / m;
      if (dev < 0.25)
        band_cands[bi][size_t(i)].push_back({m, dev});
    }
  };

  if (n_threads <= 1) {
    for (size_t bi = 0; bi < n_bands; ++bi) analyze_band(bi);
  } else {
    std::vector<std::thread> pool;
    std::vector<size_t> next_band{0};
    for (int t = 0; t < n_threads; ++t) {
      pool.emplace_back([&, t]() {
        for (size_t bi = size_t(t); bi < n_bands; bi += size_t(n_threads))
          analyze_band(bi);
      });
    }
    for (auto& th : pool) th.join();
  }
  for (size_t bi = 0; bi < n_bands; ++bi)
    for (long i = 0; i < n_frames; ++i)
      for (const auto& cd : band_cands[bi][size_t(i)])
        cands[size_t(i)].push_back(cd);

  // select best candidate per frame
  std::vector<double> f0(size_t(n_frames), 0.0);
  std::vector<double> best_score(size_t(n_frames), 1e9);
  for (long i = 0; i < n_frames; ++i) {
    for (const auto& cd : cands[size_t(i)]) {
      if (cd.score < best_score[size_t(i)]) {
        best_score[size_t(i)] = cd.score;
        f0[size_t(i)] = cd.f0;
      }
    }
    if (best_score[size_t(i)] > 0.1) f0[size_t(i)] = 0.0;  // unreliable
  }

  // fix 1: suppress octave jumps relative to running voiced median
  for (long i = 1; i < n_frames; ++i) {
    if (f0[size_t(i)] > 0 && f0[size_t(i - 1)] > 0) {
      const double r = f0[size_t(i)] / f0[size_t(i - 1)];
      if (r > 1.8 || r < 0.55) {
        // try a candidate consistent with the previous frame
        double best = 0, bs = 1e9;
        for (const auto& cd : cands[size_t(i)]) {
          const double rr = cd.f0 / f0[size_t(i - 1)];
          if (rr < 1.3 && rr > 0.77 && cd.score < bs) {
            bs = cd.score;
            best = cd.f0;
          }
        }
        f0[size_t(i)] = best;  // 0 if nothing consistent
      }
    }
  }

  // fix 2: harmonicity verification — the event statistics over-detect on
  // noise; require real periodicity at the selected lag (normalized
  // cross-correlation of the raw signal with its one-period shift)
  for (long i = 0; i < n_frames; ++i) {
    const double f = f0[size_t(i)];
    if (f <= 0) continue;
    const long lag = lround(fs / f);
    const long center = i * hop;
    const long w = lag * 2;
    const long s0 = center - w;
    double r = 0, e1 = 0, e2 = 0;
    for (long j = s0; j < s0 + 2 * w; ++j) {
      const double a = (j >= 0 && j < length) ? x[size_t(j)] : 0.0;
      const long j2 = j + lag;
      const double b = (j2 >= 0 && j2 < length) ? x[size_t(j2)] : 0.0;
      r += a * b;
      e1 += a * a;
      e2 += b * b;
    }
    const double denom = std::sqrt(e1 * e2);
    if (denom < 1e-12 || r / denom < 0.55) f0[size_t(i)] = 0.0;
  }

  // fix 3: remove voiced runs shorter than 3 frames
  long run_start = -1;
  for (long i = 0; i <= n_frames; ++i) {
    const bool v = (i < n_frames) && f0[size_t(i)] > 0;
    if (v && run_start < 0) run_start = i;
    if (!v && run_start >= 0) {
      if (i - run_start < 3)
        for (long j = run_start; j < i; ++j) f0[size_t(j)] = 0.0;
      run_start = -1;
    }
  }

  // refinement: phase-based instantaneous frequency. Two identically
  // windowed DFT probes at the candidate frequency, one period apart; the
  // demodulated phase advance measures (f_true - f) directly:
  //   Δφ = 2π (f_true − f) τ / fs  →  f_true = f + Δφ·fs/(2πτ).
  // Short (2-period) windows keep the estimate local, so vibrato-rate
  // modulation is tracked rather than smoothed.
  for (long i = 0; i < n_frames; ++i) {
    const double f = f0[size_t(i)];
    if (f <= 0) continue;
    const long center = i * hop;
    const long halfw = lround(1.0 * fs / f);  // 2-period window
    const long tau = lround(fs / f);          // one-period probe spacing

    auto probe = [&](long c, double& re, double& im) {
      re = 0;
      im = 0;
      const long s0 = c - halfw, s1 = c + halfw;
      for (long j = s0; j <= s1; ++j) {
        if (j < 0 || j >= length) continue;
        const double wpos = double(j - s0) / double(s1 - s0);
        const double w = nuttall(wpos);
        const double ang = 2 * kPi * f * double(j) / fs;
        re += x[size_t(j)] * w * std::cos(ang);
        im -= x[size_t(j)] * w * std::sin(ang);
      }
    };

    double re1, im1, re2, im2;
    probe(center, re1, im1);
    probe(center + tau, re2, im2);
    const double m1 = re1 * re1 + im1 * im1;
    const double m2 = re2 * re2 + im2 * im2;
    if (m1 < 1e-18 || m2 < 1e-18) continue;
    // Δφ of probe2 relative to probe1 with the carrier removed
    double dphi = std::atan2(im2, re2) - std::atan2(im1, re1);
    while (dphi > kPi) dphi -= 2 * kPi;
    while (dphi < -kPi) dphi += 2 * kPi;
    const double df = dphi * fs / (2 * kPi * double(tau));
    // accept only small corrections (the probe aliases past ±f/2)
    if (std::fabs(df) < 0.2 * f) f0[size_t(i)] = f + df;
  }

  std::memcpy(f0_out, f0.data(), sizeof(double) * size_t(n_frames));
  return 0;
}

}  // extern "C"
