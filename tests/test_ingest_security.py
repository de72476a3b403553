"""Crafted/mutated-container hardening for the ingest layer.

Complements test_flac_security.py (structured FLAC attacks) with
mutation fuzzing of the Ogg demuxer and mp3/WAV header paths. All of
these byte streams are reachable unauthenticated through POST /api/asr,
/api/willow and /api/sv, so every decoder must either return bounded
audio or raise IngestError/CodecError — never crash the process or
return unbounded garbage. The Ogg demuxer and dlopen'd codec bindings
are in-repo C++ (native/wisaudio/sysdec.cc), which is exactly where a
memory-safety bug would live; running mutations in-process means a
regression fails the suite as a hard crash, not a silent skip.

Reference analog: FFmpeg performs this role for the reference server
(main.py:108-120) and rejects malformed streams with errors.
"""

import numpy as np
import pytest

from wis_tpu.audio import codecs
from wis_tpu.audio.ingest import IngestError, load_audio

from tests.fixture_codecs import (
    encode_mp3,
    encode_ogg_opus,
    encode_ogg_vorbis,
    lame_available,
    ogg_pages,
    opus_available,
    vorbis_available,
    wrap_ogg_flac,
)

pytestmark = pytest.mark.skipif(
    not codecs.native_available(), reason="native wisaudio library unavailable"
)

MUTATIONS = 120


def _tone(n=6400, sr=16000):
    t = np.arange(n) / sr
    return (0.3 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)


def _assert_survives(data: bytes, codec=None):
    """Decode must finish: bounded audio or a clean error."""
    try:
        audio = load_audio(data, codec=codec)
    except (IngestError, codecs.CodecError):
        return
    assert audio.dtype == np.float32
    # 16 kHz mono out; mutated fixtures are < 1 s, cap generously
    assert audio.shape[0] <= 16000 * 60
    if audio.size:
        assert np.isfinite(audio).all()


def _mutate_and_check(valid: bytes, seed: int):
    rng = np.random.default_rng(seed)
    buf = bytearray(valid)
    for _ in range(MUTATIONS):
        kind = rng.integers(0, 3)
        if kind == 0:  # flip a random byte
            pos = int(rng.integers(0, len(buf)))
            old = buf[pos]
            buf[pos] = int(rng.integers(0, 256))
            _assert_survives(bytes(buf))
            buf[pos] = old
        elif kind == 1:  # truncate
            cut = int(rng.integers(0, len(valid)))
            _assert_survives(bytes(valid[:cut]))
        else:  # corrupt a whole aligned window
            pos = int(rng.integers(0, max(1, len(buf) - 16)))
            old = bytes(buf[pos : pos + 16])
            buf[pos : pos + 16] = rng.integers(0, 256, 16, dtype=np.uint8).tobytes()
            _assert_survives(bytes(buf))
            buf[pos : pos + 16] = old


def test_ogg_flac_mutations():
    from wis_tpu.audio.ingest import pcm_to_wav_bytes  # noqa: F401  (import check)
    from tests.fixture_codecs import wrap_ogg_flac

    flac = codecs.encode_flac(_tone()) if hasattr(codecs, "encode_flac") else None
    if flac is None:
        pytest.skip("no in-repo FLAC encoder; covered via opus/vorbis paths")
    _mutate_and_check(wrap_ogg_flac(flac), seed=1)


@pytest.mark.skipif(not opus_available(), reason="libopus not present")
def test_ogg_opus_mutations():
    _mutate_and_check(encode_ogg_opus(_tone()), seed=2)


@pytest.mark.skipif(not vorbis_available(), reason="libvorbis not present")
def test_ogg_vorbis_mutations():
    _mutate_and_check(encode_ogg_vorbis(_tone()), seed=3)


@pytest.mark.skipif(not lame_available(), reason="lame not present")
def test_mp3_mutations():
    _mutate_and_check(encode_mp3(_tone()), seed=4)


def test_ogg_synthetic_garbage_pages():
    """Structurally valid Ogg pages carrying garbage packets."""
    rng = np.random.default_rng(5)
    packets = [rng.integers(0, 256, n, dtype=np.uint8).tobytes()
               for n in (7, 300, 5000)]
    _assert_survives(ogg_pages(packets))


def test_ogg_magic_plus_noise():
    rng = np.random.default_rng(6)
    for n in (4, 26, 27, 64, 1024, 65536):
        blob = b"OggS" + rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        _assert_survives(blob)


def test_wav_header_lies():
    import struct

    def wav(fmt=1, bits=16, data_len=None, payload=b"\x00" * 64,
            channels=1, sr=16000, fmt_chunk_len=16):
        data_len = len(payload) if data_len is None else data_len
        return b"".join([
            b"RIFF", struct.pack("<I", 36 + len(payload)), b"WAVE",
            b"fmt ", struct.pack(
                "<IHHIIHH", fmt_chunk_len, fmt, channels, sr,
                (sr * channels * bits // 8) & 0xFFFFFFFF,
                (channels * bits // 8) & 0xFFFF, bits & 0xFFFF,
            ),
            b"data", struct.pack("<I", data_len), payload,
        ])

    # data chunk claims far more bytes than present
    _assert_survives(wav(data_len=1 << 30))
    # zero channels / absurd channel count
    _assert_survives(wav(channels=0))
    _assert_survives(wav(channels=65535))
    # zero / absurd sample rates
    _assert_survives(wav(sr=0))
    _assert_survives(wav(sr=0x7FFFFFFF))
    # bogus bit depths
    for bits in (0, 1, 7, 12, 64, 255):
        _assert_survives(wav(bits=bits))
    # unknown format tag
    _assert_survives(wav(fmt=0xDEAD))
    # fmt chunk length lies
    _assert_survives(wav(fmt_chunk_len=4))
    _assert_survives(wav(fmt_chunk_len=1 << 20))


def test_explicit_codec_mismatch():
    """x-audio-codec header says one thing, bytes are another
    (reference main.py:1277-1314 trusts the header the same way)."""
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, 2048, dtype=np.uint8).tobytes()
    for codec in ("wav", "flac", "mp3", "ogg"):
        _assert_survives(noise, codec=codec)
        _assert_survives(b"", codec=codec)
