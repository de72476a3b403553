/* wisaudio — in-repo native audio ingest for the TPU speech stack.
 *
 * Replaces the reference's out-of-repo native ingest chain — FFmpeg/PyAV
 * container decode (reference main.py:108-120), libsoxr/librosa resample
 * (main.py:579) — with a small self-contained C++ library reached from
 * Python via ctypes (wis_tpu/audio/codecs.py). Decode and resample are
 * host CPU work by design; only PCM float32 crosses to the TPU.
 *
 * All functions return 0 on success, negative error codes otherwise.
 * Output buffers are malloc'd; free with wisaudio_free().
 */
#ifndef WISAUDIO_H
#define WISAUDIO_H

#include <cstddef>
#include <cstdint>

extern "C" {

enum WisAudioError {
  WISAUDIO_OK = 0,
  WISAUDIO_EFORMAT = -1,   /* not a recognized container/stream */
  WISAUDIO_ECORRUPT = -2,  /* stream structure invalid */
  WISAUDIO_EUNSUPPORTED = -3, /* valid but unsupported feature */
  WISAUDIO_EARG = -4,
  WISAUDIO_ENOSYS = -5, /* system codec library unavailable on this host */
};

/* Decode a FLAC stream to interleaved float32 in [-1, 1]. */
int wisaudio_decode_flac(const uint8_t *data, size_t len, float **out,
                         int64_t *n_frames, int32_t *channels,
                         int32_t *sample_rate);

/* Decode an MPEG audio (MP3) stream via the system libmpg123
 * (dlopen'd at runtime; WISAUDIO_ENOSYS when absent). */
int wisaudio_decode_mp3(const uint8_t *data, size_t len, float **out,
                        int64_t *n_frames, int32_t *channels,
                        int32_t *sample_rate);

/* Decode an Ogg container: Vorbis (system libvorbisfile), Opus (system
 * libopus + in-repo demux) or Ogg-FLAC (repacked into the in-repo FLAC
 * decoder). */
int wisaudio_decode_ogg(const uint8_t *data, size_t len, float **out,
                        int64_t *n_frames, int32_t *channels,
                        int32_t *sample_rate);

/* Decode a RIFF/WAVE stream (PCM 8/16/24/32, IEEE float32/64, µ-law,
 * A-law) to interleaved float32. */
int wisaudio_decode_wav(const uint8_t *data, size_t len, float **out,
                        int64_t *n_frames, int32_t *channels,
                        int32_t *sample_rate);

/* Convert raw PCM (8/16/24/32-bit signed little-endian integers) to
 * interleaved float32 (the Willow ESP32 "pcm" codec path, reference
 * main.py:98-105). */
int wisaudio_pcm_to_float(const uint8_t *data, size_t len, int32_t bits,
                          float **out, int64_t *n_samples);

/* Downmix interleaved multichannel to mono (mean across channels). */
int wisaudio_mix_to_mono(const float *in, int64_t n_frames, int32_t channels,
                         float *out);

/* Windowed-sinc (Kaiser) arbitrary-ratio resampler, mono float32. */
int wisaudio_resample(const float *in, int64_t n_in, int32_t sr_in,
                      int32_t sr_out, float **out, int64_t *n_out);

void wisaudio_free(void *p);

const char *wisaudio_version(void);

} /* extern "C" */

#endif /* WISAUDIO_H */
