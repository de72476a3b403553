/* RIFF/WAVE + raw-PCM decode and channel mixdown.
 *
 * Covers the ingest formats the reference reaches through PyAV/FFmpeg and
 * the `wave` stdlib module (reference main.py:98-120): PCM 8/16/24/32,
 * IEEE float32/64, µ-law and A-law, any channel count.
 */
#include "wisaudio.h"

#include <cstdlib>
#include <cstring>

namespace {

uint32_t rd32(const uint8_t *p) {
  return uint32_t{p[0]} | (uint32_t{p[1]} << 8) | (uint32_t{p[2]} << 16) |
         (uint32_t{p[3]} << 24);
}
uint16_t rd16(const uint8_t *p) { return uint16_t(p[0] | (p[1] << 8)); }

float mulaw_to_float(uint8_t u) {
  u = ~u;
  int sign = u & 0x80;
  int exp = (u >> 4) & 0x07;
  int mant = u & 0x0F;
  int mag = ((mant << 3) + 0x84) << exp;
  mag -= 0x84;
  int16_t s = static_cast<int16_t>(sign ? -mag : mag);
  return s / 32768.0f;
}

float alaw_to_float(uint8_t a) {
  a ^= 0x55;
  int sign = a & 0x80;
  int exp = (a >> 4) & 0x07;
  int mant = a & 0x0F;
  int mag = exp == 0 ? (mant << 4) + 8 : ((mant << 4) + 0x108) << (exp - 1);
  int16_t s = static_cast<int16_t>(sign ? -mag : mag);
  return s / 32768.0f;
}

int convert_pcm(const uint8_t *p, size_t bytes, uint16_t fmt, uint16_t bits,
                float *dst, int64_t n) {
  switch (fmt) {
    case 1: /* integer PCM */
      switch (bits) {
        case 8: /* unsigned */
          for (int64_t i = 0; i < n; ++i)
            dst[i] = (int32_t{p[i]} - 128) / 128.0f;
          return WISAUDIO_OK;
        case 16:
          for (int64_t i = 0; i < n; ++i)
            dst[i] = static_cast<int16_t>(rd16(p + 2 * i)) / 32768.0f;
          return WISAUDIO_OK;
        case 24:
          for (int64_t i = 0; i < n; ++i) {
            int32_t v = (int32_t{p[3 * i]} << 8) | (int32_t{p[3 * i + 1]} << 16) |
                        (int32_t{p[3 * i + 2]} << 24);
            dst[i] = (v >> 8) / 8388608.0f;
          }
          return WISAUDIO_OK;
        case 32:
          for (int64_t i = 0; i < n; ++i)
            dst[i] = static_cast<int32_t>(rd32(p + 4 * i)) / 2147483648.0f;
          return WISAUDIO_OK;
        default:
          return WISAUDIO_EUNSUPPORTED;
      }
    case 3: /* IEEE float */
      if (bits == 32) {
        memcpy(dst, p, sizeof(float) * n);
        return WISAUDIO_OK;
      }
      if (bits == 64) {
        for (int64_t i = 0; i < n; ++i) {
          double d;
          memcpy(&d, p + 8 * i, 8);
          dst[i] = static_cast<float>(d);
        }
        return WISAUDIO_OK;
      }
      return WISAUDIO_EUNSUPPORTED;
    case 6: /* A-law */
      for (int64_t i = 0; i < n; ++i) dst[i] = alaw_to_float(p[i]);
      return WISAUDIO_OK;
    case 7: /* µ-law */
      for (int64_t i = 0; i < n; ++i) dst[i] = mulaw_to_float(p[i]);
      return WISAUDIO_OK;
    default:
      return WISAUDIO_EUNSUPPORTED;
  }
}

}  // namespace

extern "C" int wisaudio_decode_wav(const uint8_t *data, size_t len, float **out,
                                   int64_t *n_frames, int32_t *channels,
                                   int32_t *sample_rate) {
  if (!data || !out || !n_frames || !channels || !sample_rate)
    return WISAUDIO_EARG;
  if (len < 12 || memcmp(data, "RIFF", 4) != 0 ||
      memcmp(data + 8, "WAVE", 4) != 0)
    return WISAUDIO_EFORMAT;

  uint16_t fmt = 0, nch = 0, bits = 0;
  uint32_t sr = 0;
  const uint8_t *pcm = nullptr;
  size_t pcm_len = 0;

  size_t pos = 12;
  while (pos + 8 <= len) {
    const uint8_t *hdr = data + pos;
    uint32_t chunk_len = rd32(hdr + 4);
    const uint8_t *body = hdr + 8;
    if (pos + 8 + chunk_len > len) chunk_len = static_cast<uint32_t>(len - pos - 8);
    if (memcmp(hdr, "fmt ", 4) == 0 && chunk_len >= 16) {
      fmt = rd16(body);
      nch = rd16(body + 2);
      sr = rd32(body + 4);
      bits = rd16(body + 14);
      if (fmt == 0xFFFE && chunk_len >= 40) /* WAVE_FORMAT_EXTENSIBLE */
        fmt = rd16(body + 24);
    } else if (memcmp(hdr, "data", 4) == 0) {
      pcm = body;
      pcm_len = chunk_len;
    }
    pos += 8 + chunk_len + (chunk_len & 1); /* chunks are word-aligned */
  }
  if (!pcm || nch == 0 || sr == 0 || bits == 0) return WISAUDIO_ECORRUPT;

  size_t bytes_per_sample = (fmt == 6 || fmt == 7) ? 1 : bits / 8;
  if (bytes_per_sample == 0) return WISAUDIO_ECORRUPT;
  int64_t n_samples = static_cast<int64_t>(pcm_len / bytes_per_sample);
  int64_t frames = n_samples / nch;
  n_samples = frames * nch;

  float *buf = static_cast<float *>(malloc(sizeof(float) * n_samples));
  if (!buf) return WISAUDIO_ECORRUPT;
  int rc = convert_pcm(pcm, pcm_len, fmt, bits, buf, n_samples);
  if (rc != WISAUDIO_OK) {
    free(buf);
    return rc;
  }
  *out = buf;
  *n_frames = frames;
  *channels = nch;
  *sample_rate = static_cast<int32_t>(sr);
  return WISAUDIO_OK;
}

extern "C" int wisaudio_pcm_to_float(const uint8_t *data, size_t len,
                                     int32_t bits, float **out,
                                     int64_t *n_samples) {
  if (!data || !out || !n_samples) return WISAUDIO_EARG;
  if (bits != 8 && bits != 16 && bits != 24 && bits != 32)
    return WISAUDIO_EUNSUPPORTED;
  size_t bps = bits / 8;
  int64_t n = static_cast<int64_t>(len / bps);
  float *buf = static_cast<float *>(malloc(sizeof(float) * n));
  if (!buf) return WISAUDIO_ECORRUPT;
  /* raw PCM from Willow devices is signed little-endian (16-bit typical);
   * 8-bit raw PCM is signed here (unlike WAV's unsigned 8-bit) */
  switch (bits) {
    case 8:
      for (int64_t i = 0; i < n; ++i)
        buf[i] = static_cast<int8_t>(data[i]) / 128.0f;
      break;
    case 16:
      for (int64_t i = 0; i < n; ++i)
        buf[i] = static_cast<int16_t>(rd16(data + 2 * i)) / 32768.0f;
      break;
    case 24:
      for (int64_t i = 0; i < n; ++i) {
        int32_t v = (int32_t{data[3 * i]} << 8) |
                    (int32_t{data[3 * i + 1]} << 16) |
                    (int32_t{data[3 * i + 2]} << 24);
        buf[i] = (v >> 8) / 8388608.0f;
      }
      break;
    case 32:
      for (int64_t i = 0; i < n; ++i)
        buf[i] = static_cast<int32_t>(rd32(data + 4 * i)) / 2147483648.0f;
      break;
  }
  *out = buf;
  *n_samples = n;
  return WISAUDIO_OK;
}

extern "C" int wisaudio_mix_to_mono(const float *in, int64_t n_frames,
                                    int32_t channels, float *out) {
  if (!in || !out || channels <= 0) return WISAUDIO_EARG;
  if (channels == 1) {
    memcpy(out, in, sizeof(float) * n_frames);
    return WISAUDIO_OK;
  }
  const float inv = 1.0f / channels;
  for (int64_t i = 0; i < n_frames; ++i) {
    float acc = 0.0f;
    for (int32_t c = 0; c < channels; ++c) acc += in[i * channels + c];
    out[i] = acc * inv;
  }
  return WISAUDIO_OK;
}
