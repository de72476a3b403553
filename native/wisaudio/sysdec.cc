/* System-codec decode: MP3 (libmpg123) and Ogg (Vorbis via libvorbisfile,
 * Opus via libopus + in-repo Ogg demux, FLAC via Ogg→native repack into
 * the in-repo FLAC decoder).
 *
 * The reference decodes arbitrary uploads through FFmpeg/PyAV (reference
 * main.py:108-120). Shipping a from-scratch MP3/Vorbis decoder buys
 * nothing for a TPU server (pure host-CPU work), so this binds the
 * system codec libraries at runtime via dlopen — no link-time
 * dependency, and a clean WISAUDIO_ENOSYS when a library is absent so
 * ingest can report "format unsupported on this host" exactly like a
 * missing FFmpeg would.
 */
#include "wisaudio.h"

#include <dlfcn.h>

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

void *dl(const char *const names[]) {
  for (int i = 0; names[i]; ++i) {
    void *h = dlopen(names[i], RTLD_NOW | RTLD_LOCAL);
    if (h) return h;
  }
  return nullptr;
}

/* ------------------------------------------------------------------ */
/* Ogg demux (container only; RFC 3533). No CRC verification — ingest
 * trusts transport integrity, as with the FLAC path.                  */
/* ------------------------------------------------------------------ */
struct OggPackets {
  std::vector<std::vector<uint8_t>> packets;
};

bool ogg_demux(const uint8_t *data, size_t len, OggPackets *out) {
  size_t pos = 0;
  bool have_serial = false;
  uint32_t serial = 0;
  std::vector<uint8_t> pending;
  bool in_packet = false;
  while (pos + 27 <= len) {
    if (memcmp(data + pos, "OggS", 4) != 0) {
      /* resync: scan forward for the next capture pattern */
      const void *p = memchr(data + pos + 1, 'O', len - pos - 1);
      if (!p) break;
      pos = static_cast<const uint8_t *>(p) - data;
      continue;
    }
    if (data[pos + 4] != 0) return false; /* stream structure version */
    uint8_t flags = data[pos + 5];
    uint32_t pserial;
    memcpy(&pserial, data + pos + 14, 4);
    uint8_t nsegs = data[pos + 26];
    if (pos + 27 + nsegs > len) break;
    const uint8_t *lacing = data + pos + 27;
    size_t body = 0;
    for (uint8_t i = 0; i < nsegs; ++i) body += lacing[i];
    size_t body_off = pos + 27 + nsegs;
    if (body_off + body > len) break;

    if (!have_serial) {
      serial = pserial;
      have_serial = true;
    }
    if (pserial == serial) {
      if (!(flags & 0x1)) {
        /* fresh page: any unterminated packet from a broken stream is
         * dropped */
        if (!in_packet) pending.clear();
      }
      size_t off = body_off;
      for (uint8_t i = 0; i < nsegs; ++i) {
        pending.insert(pending.end(), data + off, data + off + lacing[i]);
        off += lacing[i];
        in_packet = true;
        if (lacing[i] < 255) {
          out->packets.push_back(std::move(pending));
          pending.clear();
          in_packet = false;
        }
      }
    }
    pos = body_off + body;
  }
  return !out->packets.empty();
}

/* ------------------------------------------------------------------ */
/* MP3 via libmpg123                                                    */
/* ------------------------------------------------------------------ */
struct Mpg123 {
  void *lib = nullptr;
  int (*init)() = nullptr;
  void *(*newh)(const char *, int *) = nullptr;
  void (*del)(void *) = nullptr;
  int (*param)(void *, int, long, double) = nullptr;
  int (*open_feed)(void *) = nullptr;
  int (*feed)(void *, const unsigned char *, size_t) = nullptr;
  int (*read)(void *, void *, size_t, size_t *) = nullptr;
  int (*getformat)(void *, long *, int *, int *) = nullptr;
  bool ok = false;
};

Mpg123 *mpg123() {
  static Mpg123 m;
  static bool tried = false;
  if (tried) return m.ok ? &m : nullptr;
  tried = true;
  const char *names[] = {"libmpg123.so.0", "libmpg123.so", nullptr};
  m.lib = dl(names);
  if (!m.lib) return nullptr;
  m.init = (int (*)())dlsym(m.lib, "mpg123_init");
  m.newh = (void *(*)(const char *, int *))dlsym(m.lib, "mpg123_new");
  m.del = (void (*)(void *))dlsym(m.lib, "mpg123_delete");
  m.param = (int (*)(void *, int, long, double))dlsym(m.lib, "mpg123_param");
  m.open_feed = (int (*)(void *))dlsym(m.lib, "mpg123_open_feed");
  m.feed = (int (*)(void *, const unsigned char *, size_t))dlsym(
      m.lib, "mpg123_feed");
  m.read = (int (*)(void *, void *, size_t, size_t *))dlsym(m.lib,
                                                            "mpg123_read");
  m.getformat =
      (int (*)(void *, long *, int *, int *))dlsym(m.lib, "mpg123_getformat");
  m.ok = m.init && m.newh && m.del && m.param && m.open_feed && m.feed &&
         m.read && m.getformat;
  if (m.ok && m.init() != 0) m.ok = false;
  return m.ok ? &m : nullptr;
}

/* mpg123.h constants (stable public ABI) */
enum {
  MPG123_ADD_FLAGS = 2,
  MPG123_FORCE_FLOAT = 0x400,
  MPG123_OK = 0,
  MPG123_NEED_MORE = -10,
  MPG123_NEW_FORMAT = -11,
  MPG123_DONE = -12,
  MPG123_ENC_FLOAT_32 = 0x200,
  MPG123_ENC_SIGNED_16 = 0xD0,
};

constexpr uint64_t kMaxTotalValues = uint64_t{1} << 28; /* 1 GiB of f32 */

}  // namespace

extern "C" int wisaudio_decode_mp3(const uint8_t *data, size_t len,
                                   float **out, int64_t *n_frames,
                                   int32_t *channels, int32_t *sample_rate) {
  if (!data || !out || !n_frames || !channels || !sample_rate)
    return WISAUDIO_EARG;
  Mpg123 *m = mpg123();
  if (!m) return WISAUDIO_ENOSYS;

  int err = 0;
  void *h = m->newh(nullptr, &err);
  if (!h) return WISAUDIO_ECORRUPT;
  m->param(h, MPG123_ADD_FLAGS, MPG123_FORCE_FLOAT, 0.0);
  if (m->open_feed(h) != MPG123_OK) {
    m->del(h);
    return WISAUDIO_ECORRUPT;
  }
  if (m->feed(h, data, len) != MPG123_OK) {
    m->del(h);
    return WISAUDIO_ECORRUPT;
  }

  long rate = 0;
  int nch = 0, enc = 0;
  std::vector<float> pcm;
  std::vector<uint8_t> buf(65536);
  bool got_format = false;
  for (;;) {
    size_t done = 0;
    int rc = m->read(h, buf.data(), buf.size(), &done);
    if (rc == MPG123_NEW_FORMAT) {
      m->getformat(h, &rate, &nch, &enc);
      got_format = true;
      continue;
    }
    if (done > 0 && got_format) {
      if (enc == MPG123_ENC_FLOAT_32) {
        size_t n = done / sizeof(float);
        const float *f = reinterpret_cast<const float *>(buf.data());
        if (pcm.size() + n > kMaxTotalValues) {
          m->del(h);
          return WISAUDIO_EUNSUPPORTED;
        }
        pcm.insert(pcm.end(), f, f + n);
      } else if (enc == MPG123_ENC_SIGNED_16) {
        size_t n = done / sizeof(int16_t);
        const int16_t *s = reinterpret_cast<const int16_t *>(buf.data());
        if (pcm.size() + n > kMaxTotalValues) {
          m->del(h);
          return WISAUDIO_EUNSUPPORTED;
        }
        for (size_t i = 0; i < n; ++i) pcm.push_back(s[i] / 32768.0f);
      } else {
        m->del(h);
        return WISAUDIO_EUNSUPPORTED;
      }
    }
    if (rc == MPG123_NEED_MORE || rc == MPG123_DONE) break;
    if (rc != MPG123_OK && rc != MPG123_NEW_FORMAT) break;
  }
  m->del(h);
  if (!got_format || rate <= 0 || nch <= 0 || pcm.empty())
    return WISAUDIO_ECORRUPT;

  int64_t frames = static_cast<int64_t>(pcm.size()) / nch;
  float *res = static_cast<float *>(malloc(sizeof(float) * frames * nch));
  if (!res) return WISAUDIO_ECORRUPT;
  memcpy(res, pcm.data(), sizeof(float) * frames * nch);
  *out = res;
  *n_frames = frames;
  *channels = nch;
  *sample_rate = static_cast<int32_t>(rate);
  return WISAUDIO_OK;
}

/* ------------------------------------------------------------------ */
/* Ogg Vorbis via libvorbisfile                                         */
/* ------------------------------------------------------------------ */
namespace {

struct MemCursor {
  const uint8_t *data;
  size_t len;
  size_t pos;
};

size_t mem_read(void *ptr, size_t size, size_t nmemb, void *src) {
  MemCursor *c = static_cast<MemCursor *>(src);
  size_t want = size * nmemb;
  size_t avail = c->len - c->pos;
  size_t take = want < avail ? want : avail;
  memcpy(ptr, c->data + c->pos, take);
  c->pos += take;
  return size ? take / size : 0;
}

int mem_seek(void *src, int64_t offset, int whence) {
  MemCursor *c = static_cast<MemCursor *>(src);
  int64_t target;
  if (whence == SEEK_SET)
    target = offset;
  else if (whence == SEEK_CUR)
    target = static_cast<int64_t>(c->pos) + offset;
  else
    target = static_cast<int64_t>(c->len) + offset;
  if (target < 0 || target > static_cast<int64_t>(c->len)) return -1;
  c->pos = static_cast<size_t>(target);
  return 0;
}

int mem_close(void *) { return 0; }

long mem_tell(void *src) {
  return static_cast<long>(static_cast<MemCursor *>(src)->pos);
}

struct OvCallbacks { /* matches vorbisfile's ov_callbacks ABI */
  size_t (*read)(void *, size_t, size_t, void *);
  int (*seek)(void *, int64_t, int);
  int (*close)(void *);
  long (*tell)(void *);
};

struct VorbisFileLib {
  void *lib = nullptr;
  int (*open_callbacks)(void *, void *, const char *, long, OvCallbacks) =
      nullptr;
  void *(*info)(void *, int) = nullptr;
  long (*read_float)(void *, float ***, int, int *) = nullptr;
  int (*clear)(void *) = nullptr;
  bool ok = false;
};

VorbisFileLib *vorbisfile() {
  static VorbisFileLib v;
  static bool tried = false;
  if (tried) return v.ok ? &v : nullptr;
  tried = true;
  const char *names[] = {"libvorbisfile.so.3", "libvorbisfile.so", nullptr};
  v.lib = dl(names);
  if (!v.lib) return nullptr;
  v.open_callbacks = (int (*)(void *, void *, const char *, long,
                              OvCallbacks))dlsym(v.lib, "ov_open_callbacks");
  v.info = (void *(*)(void *, int))dlsym(v.lib, "ov_info");
  v.read_float =
      (long (*)(void *, float ***, int, int *))dlsym(v.lib, "ov_read_float");
  v.clear = (int (*)(void *))dlsym(v.lib, "ov_clear");
  v.ok = v.open_callbacks && v.info && v.read_float && v.clear;
  return v.ok ? &v : nullptr;
}

int decode_vorbis(const uint8_t *data, size_t len, float **out,
                  int64_t *n_frames, int32_t *channels,
                  int32_t *sample_rate) {
  VorbisFileLib *v = vorbisfile();
  if (!v) return WISAUDIO_ENOSYS;
  MemCursor cur{data, len, 0};
  /* OggVorbis_File is caller-allocated; over-allocate generously so ABI
   * growth can never overflow (the real struct is < 1 KB). */
  std::vector<uint8_t> vf(8192, 0);
  OvCallbacks cb{mem_read, mem_seek, mem_close, mem_tell};
  if (v->open_callbacks(&cur, vf.data(), nullptr, 0, cb) != 0)
    return WISAUDIO_ECORRUPT;
  /* vorbis_info: int version; int channels; long rate; ... */
  const uint8_t *vi = static_cast<const uint8_t *>(v->info(vf.data(), -1));
  if (!vi) {
    v->clear(vf.data());
    return WISAUDIO_ECORRUPT;
  }
  int nch;
  long rate;
  memcpy(&nch, vi + 4, sizeof(int));
  memcpy(&rate, vi + 8, sizeof(long));
  if (nch <= 0 || nch > 32 || rate <= 0) {
    v->clear(vf.data());
    return WISAUDIO_ECORRUPT;
  }
  std::vector<float> pcm;
  for (;;) {
    float **chans = nullptr;
    int bitstream = 0;
    long got = v->read_float(vf.data(), &chans, 4096, &bitstream);
    if (got <= 0) break;
    if (pcm.size() + static_cast<uint64_t>(got) * nch > kMaxTotalValues) {
      v->clear(vf.data());
      return WISAUDIO_EUNSUPPORTED;
    }
    for (long i = 0; i < got; ++i)
      for (int c = 0; c < nch; ++c) pcm.push_back(chans[c][i]);
  }
  v->clear(vf.data());
  if (pcm.empty()) return WISAUDIO_ECORRUPT;
  int64_t frames = static_cast<int64_t>(pcm.size()) / nch;
  float *res = static_cast<float *>(malloc(sizeof(float) * frames * nch));
  if (!res) return WISAUDIO_ECORRUPT;
  memcpy(res, pcm.data(), sizeof(float) * frames * nch);
  *out = res;
  *n_frames = frames;
  *channels = nch;
  *sample_rate = static_cast<int32_t>(rate);
  return WISAUDIO_OK;
}

/* ------------------------------------------------------------------ */
/* Ogg Opus via libopus + the demux above (RFC 7845)                    */
/* ------------------------------------------------------------------ */
struct OpusLib {
  void *lib = nullptr;
  void *(*create)(int32_t, int, int *) = nullptr;
  int (*decode_float)(void *, const unsigned char *, int32_t, float *, int,
                      int) = nullptr;
  void (*destroy)(void *) = nullptr;
  bool ok = false;
};

OpusLib *opuslib() {
  static OpusLib o;
  static bool tried = false;
  if (tried) return o.ok ? &o : nullptr;
  tried = true;
  const char *names[] = {"libopus.so.0", "libopus.so", nullptr};
  o.lib = dl(names);
  if (!o.lib) return nullptr;
  o.create = (void *(*)(int32_t, int, int *))dlsym(o.lib,
                                                   "opus_decoder_create");
  o.decode_float = (int (*)(void *, const unsigned char *, int32_t, float *,
                            int, int))dlsym(o.lib, "opus_decode_float");
  o.destroy = (void (*)(void *))dlsym(o.lib, "opus_decoder_destroy");
  o.ok = o.create && o.decode_float && o.destroy;
  return o.ok ? &o : nullptr;
}

int decode_opus(const OggPackets &pk, float **out, int64_t *n_frames,
                int32_t *channels, int32_t *sample_rate) {
  OpusLib *o = opuslib();
  if (!o) return WISAUDIO_ENOSYS;
  const auto &head = pk.packets[0];
  if (head.size() < 19) return WISAUDIO_ECORRUPT;
  int nch = head[9];
  uint16_t pre_skip = head[10] | (head[11] << 8);
  uint8_t mapping = head[18];
  if (nch < 1 || nch > 2 || mapping != 0) return WISAUDIO_EUNSUPPORTED;
  int err = 0;
  void *dec = o->create(48000, nch, &err);
  if (!dec || err != 0) return WISAUDIO_ECORRUPT;
  std::vector<float> pcm;
  std::vector<float> frame(5760 * nch); /* 120 ms @ 48 kHz max */
  /* packets[1] is OpusTags; audio starts at 2 */
  for (size_t i = 2; i < pk.packets.size(); ++i) {
    const auto &p = pk.packets[i];
    int got = o->decode_float(dec, p.data(), static_cast<int32_t>(p.size()),
                              frame.data(), 5760, 0);
    if (got < 0) continue; /* skip undecodable packet */
    if (pcm.size() + static_cast<uint64_t>(got) * nch > kMaxTotalValues) {
      o->destroy(dec);
      return WISAUDIO_EUNSUPPORTED;
    }
    pcm.insert(pcm.end(), frame.data(), frame.data() + got * nch);
  }
  o->destroy(dec);
  size_t skip = static_cast<size_t>(pre_skip) * nch;
  if (pcm.size() <= skip) return WISAUDIO_ECORRUPT;
  int64_t frames = static_cast<int64_t>(pcm.size() - skip) / nch;
  float *res = static_cast<float *>(malloc(sizeof(float) * frames * nch));
  if (!res) return WISAUDIO_ECORRUPT;
  memcpy(res, pcm.data() + skip, sizeof(float) * frames * nch);
  *out = res;
  *n_frames = frames;
  *channels = nch;
  *sample_rate = 48000;
  return WISAUDIO_OK;
}

}  // namespace

extern "C" int wisaudio_decode_ogg(const uint8_t *data, size_t len,
                                   float **out, int64_t *n_frames,
                                   int32_t *channels, int32_t *sample_rate) {
  if (!data || !out || !n_frames || !channels || !sample_rate)
    return WISAUDIO_EARG;
  if (len < 4 || memcmp(data, "OggS", 4) != 0) return WISAUDIO_EFORMAT;
  OggPackets pk;
  if (!ogg_demux(data, len, &pk)) return WISAUDIO_ECORRUPT;
  const auto &first = pk.packets[0];

  if (first.size() >= 7 && memcmp(first.data(), "\x01vorbis", 7) == 0)
    return decode_vorbis(data, len, out, n_frames, channels, sample_rate);

  if (first.size() >= 8 && memcmp(first.data(), "OpusHead", 8) == 0)
    return decode_opus(pk, out, n_frames, channels, sample_rate);

  if (first.size() >= 5 && first[0] == 0x7F &&
      memcmp(first.data() + 1, "FLAC", 4) == 0) {
    /* Ogg-FLAC mapping: strip the 9-byte mapping header of packet 0,
     * concatenate all packets → native FLAC stream for the in-repo
     * decoder. */
    if (first.size() < 13) return WISAUDIO_ECORRUPT;
    std::vector<uint8_t> native(first.begin() + 9, first.end());
    for (size_t i = 1; i < pk.packets.size(); ++i)
      native.insert(native.end(), pk.packets[i].begin(), pk.packets[i].end());
    return wisaudio_decode_flac(native.data(), native.size(), out, n_frames,
                                channels, sample_rate);
  }
  return WISAUDIO_EUNSUPPORTED;
}
