/* FLAC stream decoder (native subset).
 *
 * From-scratch implementation of the FLAC format (RFC 9639): STREAMINFO
 * parsing, frame headers with UTF-8 coded numbers, constant / verbatim /
 * fixed / LPC subframes, Rice-coded residual partitions (methods 0 and 1
 * with escape codes), wasted bits, and left-side / right-side / mid-side
 * stereo decorrelation. Covers every stream produced by standard
 * encoders at ≤32 bps. CRCs are parsed but not verified (ingest trusts
 * transport-layer integrity, matching the reference's FFmpeg usage).
 */
#include "wisaudio.h"

#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

class BitReader {
 public:
  BitReader(const uint8_t *data, size_t len) : data_(data), len_(len) {}

  bool ReadBits(uint32_t n, uint64_t *out) {
    uint64_t v = 0;
    while (n > 0) {
      if (byte_ >= len_) return false;
      uint32_t avail = 8 - bit_;
      uint32_t take = n < avail ? n : avail;
      uint32_t shift = avail - take;
      uint32_t mask = (1u << take) - 1;
      v = (v << take) | ((data_[byte_] >> shift) & mask);
      bit_ += take;
      if (bit_ == 8) {
        bit_ = 0;
        ++byte_;
      }
      n -= take;
    }
    *out = v;
    return true;
  }

  bool ReadSigned(uint32_t n, int64_t *out) {
    uint64_t v;
    if (!ReadBits(n, &v)) return false;
    /* sign-extend */
    if (n > 0 && (v >> (n - 1)) & 1) v |= ~((uint64_t{1} << n) - 1);
    *out = static_cast<int64_t>(v);
    return true;
  }

  bool ReadUnary(uint64_t *out) {
    uint64_t count = 0;
    for (;;) {
      uint64_t b;
      if (!ReadBits(1, &b)) return false;
      if (b) break;
      ++count;
      if (count > (len_ * 8)) return false;
    }
    *out = count;
    return true;
  }

  void AlignToByte() {
    if (bit_ != 0) {
      bit_ = 0;
      ++byte_;
    }
  }

  bool AtEnd() const { return byte_ >= len_; }
  size_t BytePos() const { return byte_; }

 private:
  const uint8_t *data_;
  size_t len_;
  size_t byte_ = 0;
  uint32_t bit_ = 0;
};

struct StreamInfo {
  uint32_t sample_rate = 0;
  uint32_t channels = 0;
  uint32_t bps = 0;
  uint64_t total_samples = 0;
};

bool ReadUtf8Number(BitReader *br, uint64_t *out) {
  uint64_t b0;
  if (!br->ReadBits(8, &b0)) return false;
  int extra;
  uint64_t v;
  if ((b0 & 0x80) == 0) {
    *out = b0;
    return true;
  } else if ((b0 & 0xE0) == 0xC0) {
    extra = 1;
    v = b0 & 0x1F;
  } else if ((b0 & 0xF0) == 0xE0) {
    extra = 2;
    v = b0 & 0x0F;
  } else if ((b0 & 0xF8) == 0xF0) {
    extra = 3;
    v = b0 & 0x07;
  } else if ((b0 & 0xFC) == 0xF8) {
    extra = 4;
    v = b0 & 0x03;
  } else if ((b0 & 0xFE) == 0xFC) {
    extra = 5;
    v = b0 & 0x01;
  } else if (b0 == 0xFE) {
    extra = 6;
    v = 0;
  } else {
    return false;
  }
  for (int i = 0; i < extra; ++i) {
    uint64_t b;
    if (!br->ReadBits(8, &b)) return false;
    if ((b & 0xC0) != 0x80) return false;
    v = (v << 6) | (b & 0x3F);
  }
  *out = v;
  return true;
}

/* Rice / verbatim residual into res[order .. block_size). */
bool ReadResidual(BitReader *br, uint32_t block_size, uint32_t order,
                  std::vector<int64_t> *res) {
  uint64_t method, porder;
  if (!br->ReadBits(2, &method)) return false;
  if (method > 1) return false;
  uint32_t param_bits = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 0x0F : 0x1F;
  if (!br->ReadBits(4, &porder)) return false;
  uint32_t partitions = 1u << porder;
  if (block_size % partitions != 0) return false;
  uint32_t part_len = block_size >> porder;
  /* The first partition holds part_len - order samples; a predictor
   * order exceeding the partition length would underflow the count
   * (crafted-stream heap overflow — reject, the format forbids it). */
  if (order > part_len) return false;
  uint32_t idx = order;
  for (uint32_t p = 0; p < partitions; ++p) {
    uint32_t count = part_len - (p == 0 ? order : 0);
    if (idx + uint64_t{count} > block_size) return false;
    uint64_t param;
    if (!br->ReadBits(param_bits, &param)) return false;
    if (param == escape) {
      uint64_t raw_bits;
      if (!br->ReadBits(5, &raw_bits)) return false;
      for (uint32_t i = 0; i < count; ++i) {
        int64_t v = 0;
        if (raw_bits > 0) {
          if (!br->ReadSigned(static_cast<uint32_t>(raw_bits), &v)) return false;
        }
        (*res)[idx++] = v;
      }
    } else {
      for (uint32_t i = 0; i < count; ++i) {
        uint64_t q, r = 0;
        if (!br->ReadUnary(&q)) return false;
        if (param > 0 && !br->ReadBits(static_cast<uint32_t>(param), &r))
          return false;
        uint64_t u = (q << param) | r;
        (*res)[idx++] = static_cast<int64_t>(u >> 1) ^
                        -static_cast<int64_t>(u & 1); /* zigzag */
      }
    }
  }
  return idx == block_size;
}

bool ReadSubframe(BitReader *br, uint32_t block_size, uint32_t bps,
                  std::vector<int64_t> *out) {
  uint64_t pad, type_code, wasted_flag;
  if (!br->ReadBits(1, &pad) || pad != 0) return false;
  if (!br->ReadBits(6, &type_code)) return false;
  uint32_t wasted = 0;
  if (!br->ReadBits(1, &wasted_flag)) return false;
  if (wasted_flag) {
    uint64_t u;
    if (!br->ReadUnary(&u)) return false;
    wasted = static_cast<uint32_t>(u) + 1;
  }
  if (wasted >= bps) return false;
  uint32_t eff_bps = bps - wasted;
  out->assign(block_size, 0);

  if (type_code == 0) { /* CONSTANT */
    int64_t v;
    if (!br->ReadSigned(eff_bps, &v)) return false;
    for (uint32_t i = 0; i < block_size; ++i) (*out)[i] = v;
  } else if (type_code == 1) { /* VERBATIM */
    for (uint32_t i = 0; i < block_size; ++i)
      if (!br->ReadSigned(eff_bps, &(*out)[i])) return false;
  } else if (type_code >= 8 && type_code <= 12) { /* FIXED */
    uint32_t order = static_cast<uint32_t>(type_code) - 8;
    if (order > block_size) return false;
    for (uint32_t i = 0; i < order; ++i)
      if (!br->ReadSigned(eff_bps, &(*out)[i])) return false;
    if (!ReadResidual(br, block_size, order, out)) return false;
    for (uint32_t i = order; i < block_size; ++i) {
      int64_t *s = out->data() + i;
      switch (order) {
        case 0: break;
        case 1: *s += s[-1]; break;
        case 2: *s += 2 * s[-1] - s[-2]; break;
        case 3: *s += 3 * s[-1] - 3 * s[-2] + s[-3]; break;
        case 4: *s += 4 * s[-1] - 6 * s[-2] + 4 * s[-3] - s[-4]; break;
      }
    }
  } else if (type_code >= 32) { /* LPC, order = code - 31 */
    uint32_t order = static_cast<uint32_t>(type_code) - 31;
    if (order > block_size) return false;
    for (uint32_t i = 0; i < order; ++i)
      if (!br->ReadSigned(eff_bps, &(*out)[i])) return false;
    uint64_t prec_m1;
    if (!br->ReadBits(4, &prec_m1) || prec_m1 == 15) return false;
    uint32_t precision = static_cast<uint32_t>(prec_m1) + 1;
    int64_t shift;
    if (!br->ReadSigned(5, &shift) || shift < 0) return false;
    std::vector<int64_t> coeffs(order);
    for (uint32_t i = 0; i < order; ++i)
      if (!br->ReadSigned(precision, &coeffs[i])) return false;
    if (!ReadResidual(br, block_size, order, out)) return false;
    for (uint32_t i = order; i < block_size; ++i) {
      __int128 acc = 0;
      for (uint32_t j = 0; j < order; ++j)
        acc += static_cast<__int128>(coeffs[j]) * (*out)[i - 1 - j];
      (*out)[i] += static_cast<int64_t>(acc >> shift);
    }
  } else {
    return false; /* reserved type */
  }

  if (wasted > 0)
    for (uint32_t i = 0; i < block_size; ++i) (*out)[i] <<= wasted;
  return true;
}

const uint32_t kBlockSizes[16] = {0,   192,  576,  1152, 2304, 4608, 0, 0,
                                  256, 512, 1024, 2048, 4096, 8192, 16384,
                                  32768};
const uint32_t kSampleRates[16] = {0,     88200, 176400, 192000, 8000, 16000,
                                   22050, 24000, 32000,  44100,  48000, 96000,
                                   0,     0,     0,      0};

}  // namespace

extern "C" int wisaudio_decode_flac(const uint8_t *data, size_t len,
                                    float **out, int64_t *n_frames,
                                    int32_t *channels, int32_t *sample_rate) {
  if (!data || !out || !n_frames || !channels || !sample_rate)
    return WISAUDIO_EARG;
  if (len < 8 || memcmp(data, "fLaC", 4) != 0) return WISAUDIO_EFORMAT;

  StreamInfo info;
  size_t pos = 4;
  bool have_info = false;
  for (;;) {
    if (pos + 4 > len) return WISAUDIO_ECORRUPT;
    bool last = data[pos] & 0x80;
    uint32_t btype = data[pos] & 0x7F;
    uint32_t blen =
        (uint32_t{data[pos + 1]} << 16) | (uint32_t{data[pos + 2]} << 8) |
        data[pos + 3];
    pos += 4;
    if (pos + blen > len) return WISAUDIO_ECORRUPT;
    if (btype == 0 && blen >= 34) {
      const uint8_t *b = data + pos;
      info.sample_rate = (uint32_t{b[10]} << 12) | (uint32_t{b[11]} << 4) |
                         (b[12] >> 4);
      info.channels = ((b[12] >> 1) & 0x7) + 1;
      info.bps = (((b[12] & 1) << 4) | (b[13] >> 4)) + 1;
      info.total_samples = (uint64_t{b[13] & 0x0F} << 32) |
                           (uint64_t{b[14]} << 24) | (uint64_t{b[15]} << 16) |
                           (uint64_t{b[16]} << 8) | b[17];
      have_info = true;
    }
    pos += blen;
    if (last) break;
  }
  if (!have_info || info.sample_rate == 0) return WISAUDIO_ECORRUPT;
  if (info.bps > 32) return WISAUDIO_EUNSUPPORTED;

  std::vector<float> pcm;
  /* total_samples is attacker-controlled (up to 2^36): cap the eager
   * reservation — it is only an optimization — and bound total decoded
   * output so a tiny crafted stream cannot balloon memory (escape
   * partitions emit 65536 samples for ~20 input bytes). */
  const uint64_t kMaxTotalValues = uint64_t{1} << 28; /* 1 GiB of f32 */
  uint64_t expect = info.total_samples * info.channels;
  if (info.total_samples)
    pcm.reserve(static_cast<size_t>(
        expect < kMaxTotalValues ? expect : kMaxTotalValues));

  BitReader br(data + pos, len - pos);
  std::vector<std::vector<int64_t>> chan(info.channels);
  const double scale = 1.0 / (int64_t{1} << (info.bps - 1));

  while (!br.AtEnd()) {
    uint64_t sync;
    if (!br.ReadBits(14, &sync)) break;
    if (sync != 0x3FFE) return WISAUDIO_ECORRUPT;
    uint64_t reserved, blocking, bs_code, sr_code, ch_code, ss_code, r2;
    if (!br.ReadBits(1, &reserved) || !br.ReadBits(1, &blocking) ||
        !br.ReadBits(4, &bs_code) || !br.ReadBits(4, &sr_code) ||
        !br.ReadBits(4, &ch_code) || !br.ReadBits(3, &ss_code) ||
        !br.ReadBits(1, &r2))
      return WISAUDIO_ECORRUPT;
    uint64_t coded_number;
    if (!ReadUtf8Number(&br, &coded_number)) return WISAUDIO_ECORRUPT;

    uint32_t block_size = kBlockSizes[bs_code];
    if (bs_code == 6) {
      uint64_t v;
      if (!br.ReadBits(8, &v)) return WISAUDIO_ECORRUPT;
      block_size = static_cast<uint32_t>(v) + 1;
    } else if (bs_code == 7) {
      uint64_t v;
      if (!br.ReadBits(16, &v)) return WISAUDIO_ECORRUPT;
      block_size = static_cast<uint32_t>(v) + 1;
    }
    if (block_size == 0) return WISAUDIO_ECORRUPT;

    if (sr_code == 12) {
      uint64_t v;
      if (!br.ReadBits(8, &v)) return WISAUDIO_ECORRUPT;
    } else if (sr_code == 13 || sr_code == 14) {
      uint64_t v;
      if (!br.ReadBits(16, &v)) return WISAUDIO_ECORRUPT;
    }
    (void)kSampleRates;

    uint32_t bps = info.bps;
    switch (ss_code) {
      case 0: break;
      case 1: bps = 8; break;
      case 2: bps = 12; break;
      case 4: bps = 16; break;
      case 5: bps = 20; break;
      case 6: bps = 24; break;
      case 7: bps = 32; break;
      default: return WISAUDIO_ECORRUPT;
    }

    uint64_t crc8;
    if (!br.ReadBits(8, &crc8)) return WISAUDIO_ECORRUPT;

    uint32_t nch = info.channels;
    bool left_side = false, right_side = false, mid_side = false;
    if (ch_code <= 7) {
      nch = static_cast<uint32_t>(ch_code) + 1;
      if (nch != info.channels) return WISAUDIO_ECORRUPT;
    } else if (ch_code == 8) {
      left_side = true;
      nch = 2;
    } else if (ch_code == 9) {
      right_side = true;
      nch = 2;
    } else if (ch_code == 10) {
      mid_side = true;
      nch = 2;
    } else {
      return WISAUDIO_ECORRUPT;
    }
    /* side-stereo frames require a 2-channel stream: `chan` is sized
     * info.channels, so a mono STREAMINFO + side frame would write
     * chan[1] out of bounds. */
    if (nch != info.channels) return WISAUDIO_ECORRUPT;

    for (uint32_t c = 0; c < nch; ++c) {
      uint32_t sub_bps = bps;
      /* the difference (side) channel carries one extra bit */
      if ((left_side && c == 1) || (right_side && c == 0) ||
          (mid_side && c == 1))
        ++sub_bps;
      if (!ReadSubframe(&br, block_size, sub_bps, &chan[c]))
        return WISAUDIO_ECORRUPT;
    }
    br.AlignToByte();
    uint64_t crc16;
    if (!br.ReadBits(16, &crc16)) return WISAUDIO_ECORRUPT;

    /* stereo decorrelation */
    if (left_side) {
      for (uint32_t i = 0; i < block_size; ++i)
        chan[1][i] = chan[0][i] - chan[1][i];
    } else if (right_side) {
      for (uint32_t i = 0; i < block_size; ++i)
        chan[0][i] = chan[1][i] + chan[0][i];
    } else if (mid_side) {
      for (uint32_t i = 0; i < block_size; ++i) {
        int64_t side = chan[1][i];
        int64_t mid = (chan[0][i] << 1) | (side & 1);
        chan[0][i] = (mid + side) >> 1;
        chan[1][i] = (mid - side) >> 1;
      }
    }

    if (pcm.size() + uint64_t{block_size} * info.channels > kMaxTotalValues)
      return WISAUDIO_EUNSUPPORTED; /* decompression-bomb guard */
    for (uint32_t i = 0; i < block_size; ++i)
      for (uint32_t c = 0; c < info.channels; ++c)
        pcm.push_back(static_cast<float>(chan[c][i] * scale));

    if (info.total_samples &&
        pcm.size() >= info.total_samples * info.channels)
      break;
  }

  int64_t frames = static_cast<int64_t>(pcm.size() / info.channels);
  if (info.total_samples && frames > static_cast<int64_t>(info.total_samples))
    frames = static_cast<int64_t>(info.total_samples);
  float *buf =
      static_cast<float *>(malloc(sizeof(float) * frames * info.channels));
  if (!buf) return WISAUDIO_ECORRUPT;
  memcpy(buf, pcm.data(), sizeof(float) * frames * info.channels);
  *out = buf;
  *n_frames = frames;
  *channels = static_cast<int32_t>(info.channels);
  *sample_rate = static_cast<int32_t>(info.sample_rate);
  return WISAUDIO_OK;
}
