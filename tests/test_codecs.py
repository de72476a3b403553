"""Native codec library tests: FLAC/WAV decode, PCM conversion, resample.

The FLAC decoder is validated against the reference's real fixtures
(reference client/*.flac — 16 kHz mono 16-bit speech) and against WAV
round-trips of synthetic signals.
"""

import io
import wave

import numpy as np
import pytest

from wis_tpu.audio import codecs
from wis_tpu.audio.ingest import (
    load_audio,
    pcm_to_wav_bytes,
    sniff_format,
    wav_stream_header,
)

pytestmark = pytest.mark.skipif(
    not codecs.native_available(), reason="native wisaudio library unavailable"
)


def _tone(n=16000, sr=16000, f=440.0, amp=0.5):
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * f * t)).astype(np.float32)


def _wav_bytes(pcm: np.ndarray, sr=16000, channels=1) -> bytes:
    ints = (np.clip(pcm, -1, 1) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(ints.tobytes())
    return buf.getvalue()


def test_decode_flac_fixtures(reference_dir):
    expected = {"3sec.flac": 61440, "10sec.flac": 171008, "30sec.flac": 467968}
    for name, n in expected.items():
        data = (reference_dir / "client" / name).read_bytes()
        pcm, channels, sr = codecs.decode_flac(data)
        assert sr == 16000 and channels == 1
        assert pcm.shape == (n, 1)
        # real speech: finite, in range, not silent
        assert np.isfinite(pcm).all()
        assert np.abs(pcm).max() <= 1.0
        assert np.abs(pcm).max() > 0.01


def test_decode_wav_roundtrip():
    tone = _tone()
    pcm, channels, sr = codecs.decode_wav(_wav_bytes(tone))
    assert sr == 16000 and channels == 1
    np.testing.assert_allclose(pcm[:, 0], tone, atol=1e-4)


def test_decode_wav_stereo_mixdown():
    left = _tone(f=440.0)
    right = _tone(f=880.0)
    inter = np.stack([left, right], axis=1).reshape(-1)
    data = _wav_bytes(inter.reshape(-1, 2).reshape(-1), channels=2)
    pcm, channels, sr = codecs.decode_wav(data)
    assert channels == 2
    mono = codecs.mix_to_mono(pcm)
    np.testing.assert_allclose(mono, (left + right) / 2, atol=1e-3)


def test_pcm_to_float():
    raw = np.asarray([0, 16384, -16384, 32767, -32768], dtype="<i2").tobytes()
    out = codecs.pcm_to_float(raw, 16)
    np.testing.assert_allclose(
        out, [0.0, 0.5, -0.5, 32767 / 32768, -1.0], atol=1e-6
    )


def test_resample_downsample_tone():
    sr_in, sr_out, f = 48000, 16000, 1000.0
    n = 48000
    tone = _tone(n=n, sr=sr_in, f=f)
    out = codecs.resample(tone, sr_in, sr_out)
    assert abs(out.shape[0] - n * sr_out // sr_in) <= 1
    # the dominant frequency must be preserved
    spec = np.abs(np.fft.rfft(out[1000:-1000] * np.hanning(out.shape[0] - 2000)))
    peak_hz = np.argmax(spec) * sr_out / (out.shape[0] - 2000)
    assert abs(peak_hz - f) < 5.0


def test_resample_upsample_identity_band():
    sr_in, sr_out = 8000, 16000
    tone = _tone(n=8000, sr=sr_in, f=700.0)
    out = codecs.resample(tone, sr_in, sr_out)
    spec = np.abs(np.fft.rfft(out[500:-500] * np.hanning(out.shape[0] - 1000)))
    peak_hz = np.argmax(spec) * sr_out / (out.shape[0] - 1000)
    assert abs(peak_hz - 700.0) < 5.0


def test_load_audio_flac(flac_fixture_3s):
    audio = load_audio(flac_fixture_3s.read_bytes())
    assert audio.ndim == 1
    assert audio.shape[0] == 61440  # already 16 kHz — no resample
    assert audio.dtype == np.float32


def test_load_audio_pcm_header_path():
    tone = _tone()
    raw = (tone * 32767).astype("<i2").tobytes()
    audio = load_audio(raw, codec="pcm", sample_rate=16000, bits=16, channels=1)
    np.testing.assert_allclose(audio, tone, atol=1e-3)


def test_sniff_format():
    assert sniff_format(b"fLaC....") == "flac"
    assert sniff_format(b"RIFF1234WAVEfmt ") == "wav"
    assert sniff_format(b"\x00\x01\x02\x03") == "unknown"


def test_wav_export_and_header():
    tone = _tone(n=100)
    data = pcm_to_wav_bytes(tone)
    pcm, channels, sr = codecs.decode_wav(data)
    assert sr == 16000 and pcm.shape[0] == 100
    hdr = wav_stream_header()
    assert hdr[:4] == b"RIFF" and hdr[8:12] == b"WAVE" and len(hdr) == 44
