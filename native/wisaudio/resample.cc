/* Kaiser-windowed-sinc arbitrary-ratio resampler.
 *
 * Replaces the libsoxr/librosa resample-on-load step (reference
 * main.py:579: librosa.load(sr=16000)). Direct-form windowed-sinc
 * interpolation with a precomputed polyphase filter table: ~90 dB
 * stopband (Kaiser β=8.6), 32 taps per phase, 512 phases with linear
 * interpolation between phases.
 */
#include "wisaudio.h"

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

double bessel_i0(double x) {
  /* series expansion; converges fast for |x| ≤ ~20 */
  double sum = 1.0, term = 1.0;
  for (int k = 1; k < 64; ++k) {
    term *= (x / (2.0 * k)) * (x / (2.0 * k));
    sum += term;
    if (term < 1e-16 * sum) break;
  }
  return sum;
}

constexpr int kTapsPerPhase = 32;  /* even; taps span [-16, +16) input samples */
constexpr int kPhases = 512;
constexpr double kBeta = 8.6;      /* Kaiser β ≈ 90 dB stopband */

struct FilterTable {
  std::vector<float> coeff;  /* (kPhases+1) x kTapsPerPhase */
  double cutoff;             /* relative to input Nyquist */
};

/* Build a lowpass with cutoff = min(1, sr_out/sr_in) * rolloff. */
FilterTable BuildFilter(double ratio) {
  FilterTable ft;
  ft.cutoff = (ratio < 1.0 ? ratio : 1.0) * 0.945;
  ft.coeff.resize((kPhases + 1) * kTapsPerPhase);
  const double i0_beta = bessel_i0(kBeta);
  const int half = kTapsPerPhase / 2;
  for (int p = 0; p <= kPhases; ++p) {
    double frac = static_cast<double>(p) / kPhases;
    double sum = 0.0;
    for (int t = 0; t < kTapsPerPhase; ++t) {
      /* tap offset from interpolation point, in input samples */
      double x = (t - half + 1) - frac;
      double sinc_arg = M_PI * x * ft.cutoff;
      double sinc = x == 0.0 ? 1.0 : std::sin(sinc_arg) / (M_PI * x);
      double w_arg = x / half;
      double window =
          std::abs(w_arg) >= 1.0
              ? 0.0
              : bessel_i0(kBeta * std::sqrt(1.0 - w_arg * w_arg)) / i0_beta;
      double c = sinc * window;
      ft.coeff[p * kTapsPerPhase + t] = static_cast<float>(c);
      sum += c;
    }
    /* normalize each phase to unity DC gain */
    if (sum != 0.0) {
      for (int t = 0; t < kTapsPerPhase; ++t)
        ft.coeff[p * kTapsPerPhase + t] =
            static_cast<float>(ft.coeff[p * kTapsPerPhase + t] / sum);
    }
  }
  return ft;
}

}  // namespace

extern "C" int wisaudio_resample(const float *in, int64_t n_in, int32_t sr_in,
                                 int32_t sr_out, float **out, int64_t *n_out) {
  if (!in || !out || !n_out || sr_in <= 0 || sr_out <= 0) return WISAUDIO_EARG;
  if (sr_in == sr_out) {
    float *buf = static_cast<float *>(malloc(sizeof(float) * n_in));
    if (!buf) return WISAUDIO_ECORRUPT;
    memcpy(buf, in, sizeof(float) * n_in);
    *out = buf;
    *n_out = n_in;
    return WISAUDIO_OK;
  }

  const double ratio = static_cast<double>(sr_out) / sr_in;
  FilterTable ft = BuildFilter(ratio);
  const int half = kTapsPerPhase / 2;

  int64_t count = static_cast<int64_t>(
      std::ceil(static_cast<double>(n_in) * sr_out / sr_in));
  float *buf = static_cast<float *>(malloc(sizeof(float) * count));
  if (!buf) return WISAUDIO_ECORRUPT;

  for (int64_t i = 0; i < count; ++i) {
    double t = static_cast<double>(i) * sr_in / sr_out;
    int64_t base = static_cast<int64_t>(std::floor(t));
    double frac = t - base;
    int phase = static_cast<int>(frac * kPhases);
    double pfrac = frac * kPhases - phase;
    const float *c0 = ft.coeff.data() + phase * kTapsPerPhase;
    const float *c1 = ft.coeff.data() + (phase + 1) * kTapsPerPhase;
    double acc = 0.0;
    for (int tap = 0; tap < kTapsPerPhase; ++tap) {
      int64_t idx = base + (tap - half + 1);
      if (idx < 0 || idx >= n_in) continue;
      double c = c0[tap] + (c1[tap] - c0[tap]) * pfrac;
      acc += c * in[idx];
    }
    buf[i] = static_cast<float>(acc);
  }
  *out = buf;
  *n_out = count;
  return WISAUDIO_OK;
}

extern "C" void wisaudio_free(void *p) { free(p); }

extern "C" const char *wisaudio_version(void) { return "wisaudio 0.1.0"; }
