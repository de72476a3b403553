"""Crafted-stream hardening tests for the native FLAC decoder.

These frames are reachable unauthenticated through POST /api/asr,
/api/willow and /api/sv (container sniffing routes 'fLaC' bytes to the
native decoder), so malformed input must fail cleanly — never write out
of bounds or balloon memory. Reference behavior analog: FFmpeg's decoder
rejects these streams (reference main.py:108-120).
"""

import numpy as np
import pytest

from wis_tpu.audio import codecs

pytestmark = pytest.mark.skipif(
    not codecs.native_available(), reason="native wisaudio library unavailable"
)


class BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value: int, n: int):
        for i in reversed(range(n)):
            self.bits.append((value >> i) & 1)

    def bytes(self) -> bytes:
        while len(self.bits) % 8:
            self.bits.append(0)
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _streaminfo(channels=1, bps=16, sample_rate=16000, total_samples=4096) -> bytes:
    w = BitWriter()
    w.write(4096, 16)  # min block
    w.write(4096, 16)  # max block
    w.write(0, 24)  # min frame
    w.write(0, 24)  # max frame
    w.write(sample_rate, 20)
    w.write(channels - 1, 3)
    w.write(bps - 1, 5)
    w.write(total_samples, 36)
    w.write(0, 128)  # md5
    body = w.bytes()
    assert len(body) == 34
    header = bytes([0x80, 0, 0, 34])  # last=1, type=0 (STREAMINFO), len=34
    return b"fLaC" + header + body


def _frame_header(w: BitWriter, bs_code=12, sr_code=5, ch_code=0, ss_code=4):
    w.write(0x3FFE, 14)  # sync
    w.write(0, 1)  # reserved
    w.write(0, 1)  # blocking strategy
    w.write(bs_code, 4)  # 12 -> 4096
    w.write(sr_code, 4)  # 5 -> 16000
    w.write(ch_code, 4)
    w.write(ss_code, 3)  # 4 -> 16 bps
    w.write(0, 1)  # reserved
    w.write(0, 8)  # UTF-8 coded number 0
    w.write(0, 8)  # crc8 (not verified)


def test_lpc_order_exceeding_partition_length_rejected():
    """Advisor finding (flac.cc residual decode): LPC order 32 with
    partition order 12 on a 4096 block gives part_len=1 < order — the
    unpatched count underflowed uint32 and wrote ~2^32 zeros past the
    block-sized vector (segfault / heap corruption). Must now be a clean
    decode error."""
    w = BitWriter()
    _frame_header(w)
    w.write(0, 1)  # subframe pad
    w.write(63, 6)  # LPC order 32 (type 31+32)
    w.write(0, 1)  # no wasted bits
    for _ in range(32):  # warmup samples
        w.write(0, 16)
    w.write(0, 4)  # precision-1 = 0
    w.write(0, 5)  # shift = 0
    for _ in range(32):  # 1-bit coefficients
        w.write(0, 1)
    w.write(0, 2)  # residual method 0 (4-bit rice)
    w.write(12, 4)  # partition order 12 -> 4096 partitions of length 1
    w.write(0x0F, 4)  # first partition: escape code
    w.write(0, 5)  # raw_bits = 0 (zero-cost infinite zeros pre-patch)
    data = _streaminfo() + w.bytes()
    with pytest.raises(codecs.CodecError):
        codecs.decode_flac(data)


def test_side_stereo_frame_on_mono_stream_rejected():
    """A left-side frame (ch_code=8) forces two subframe buffers, but the
    channel vector array is sized from STREAMINFO — mono STREAMINFO +
    side frame wrote chan[1] out of bounds. Must be rejected before any
    subframe decode."""
    w = BitWriter()
    _frame_header(w, ch_code=8)
    data = _streaminfo(channels=1) + w.bytes()
    with pytest.raises(codecs.CodecError):
        codecs.decode_flac(data)


def test_huge_total_samples_does_not_allocate():
    """STREAMINFO total_samples is attacker-controlled up to 2^36; the
    eager reserve must be capped instead of throwing bad_alloc across
    the extern C boundary."""
    data = _streaminfo(channels=8, total_samples=(1 << 36) - 1)
    # No frames follow: decode yields zero frames (or a clean error),
    # never an abort / MemoryError blowup.
    try:
        pcm, channels, sr = codecs.decode_flac(data)
        assert pcm.shape[0] == 0
    except codecs.CodecError:
        pass


def test_valid_fixture_still_decodes(reference_dir):
    """Hardening must not reject well-formed streams."""
    data = (reference_dir / "client" / "3sec.flac").read_bytes()
    pcm, channels, sr = codecs.decode_flac(data)
    assert sr == 16000 and channels == 1 and pcm.shape[0] == 61440
    assert np.isfinite(pcm).all()
