"""Test-fixture encoders: synthesize MP3 / Ogg-Opus / Ogg-FLAC streams
using the system encoder libraries (libmp3lame, libopus) via ctypes and
a small pure-Python Ogg paginator. Test-support only — the production
decode path is native/wisaudio/sysdec.cc."""

from __future__ import annotations

import ctypes
import struct
import zlib  # noqa: F401  (documentational; ogg CRC is NOT zlib crc32)

import numpy as np


def _try_cdll(*names):
    for n in names:
        try:
            return ctypes.CDLL(n)
        except OSError:
            continue
    return None


# --------------------------------------------------------------------- #
# MP3 via libmp3lame
# --------------------------------------------------------------------- #
def lame_available() -> bool:
    return _try_cdll("libmp3lame.so.0", "libmp3lame.so") is not None


def encode_mp3(pcm: np.ndarray, sr: int = 16000, brate: int = 64) -> bytes:
    """mono float32 [-1,1] → MP3 bytes (CBR)."""
    lame = _try_cdll("libmp3lame.so.0", "libmp3lame.so")
    if lame is None:
        raise RuntimeError("libmp3lame unavailable")
    lame.lame_init.restype = ctypes.c_void_p
    gf = ctypes.c_void_p(lame.lame_init())
    lame.lame_set_in_samplerate(gf, sr)
    lame.lame_set_num_channels(gf, 1)
    lame.lame_set_mode(gf, 3)  # mono
    lame.lame_set_brate(gf, brate)
    assert lame.lame_init_params(gf) >= 0
    shorts = (np.clip(pcm, -1, 1) * 32767).astype(np.int16)
    n = len(shorts)
    out = ctypes.create_string_buffer(int(1.25 * n) + 7200)
    written = lame.lame_encode_buffer(
        gf,
        shorts.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
        shorts.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
        n,
        out,
        len(out),
    )
    assert written >= 0
    data = out.raw[:written]
    tail = ctypes.create_string_buffer(7200)
    flushed = lame.lame_encode_flush(gf, tail, len(tail))
    lame.lame_close(gf)
    return data + tail.raw[:flushed]


# --------------------------------------------------------------------- #
# Ogg paginator (RFC 3533) with the Ogg CRC (poly 0x04c11db7, no
# reflection, init/xorout 0 — deliberately not zlib's crc32)
# --------------------------------------------------------------------- #
_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if _r & 0x80000000 else (_r << 1) & 0xFFFFFFFF
    _CRC_TABLE.append(_r)


def _ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) & 0xFF) ^ b]
    return crc


def ogg_pages(packets, serial=0x1234, granules=None) -> bytes:
    """Lay packets into Ogg pages (one packet group per page; packets
    longer than 255*255 bytes continue across pages)."""
    out = bytearray()
    seq = 0
    n = len(packets)
    for i, pkt in enumerate(packets):
        pkt = bytes(pkt)
        granule = granules[i] if granules else 0
        first_chunk = True
        pos = 0
        while True:
            chunk = pkt[pos : pos + 255 * 255]
            pos += len(chunk)
            done = pos >= len(pkt)
            lacing = []
            rem = len(chunk)
            while rem >= 255:
                lacing.append(255)
                rem -= 255
            if done:
                lacing.append(rem)  # terminating lacing (may be 0)
            elif rem:
                # continued packet must end the page on a 255 boundary;
                # fold the remainder back
                pos -= rem
                chunk = chunk[: len(chunk) - rem]
            header_type = 0
            if not first_chunk:
                header_type |= 0x1  # continuation
            if i == 0 and first_chunk:
                header_type |= 0x2  # BOS
            if i == n - 1 and done:
                header_type |= 0x4  # EOS
            hdr = struct.pack(
                "<4sBBQIIIB",
                b"OggS",
                0,
                header_type,
                granule if done else 0xFFFFFFFFFFFFFFFF,
                serial,
                seq,
                0,  # crc placeholder
                len(lacing),
            ) + bytes(lacing)
            page = hdr + chunk
            crc = _ogg_crc(page)
            page = page[:22] + struct.pack("<I", crc) + page[26:]
            out += page
            seq += 1
            first_chunk = False
            if done:
                break
    return bytes(out)


def wrap_ogg_flac(flac_bytes: bytes) -> bytes:
    """Native FLAC stream → Ogg-FLAC (RFC 9639 §10.2 mapping)."""
    assert flac_bytes[:4] == b"fLaC"
    pos = 4
    blocks = []
    while True:
        hdr = flac_bytes[pos : pos + 4]
        last = hdr[0] & 0x80
        blen = int.from_bytes(hdr[1:4], "big")
        blocks.append(flac_bytes[pos : pos + 4 + blen])
        pos += 4 + blen
        if last:
            break
    frames = flac_bytes[pos:]
    nheader = len(blocks)  # counting packet 0's STREAMINFO + the rest
    packet0 = (
        b"\x7fFLAC"
        + bytes([1, 0])
        + struct.pack(">H", nheader)
        + b"fLaC"
        + blocks[0]
    )
    packets = [packet0] + blocks[1:] + [frames]
    return ogg_pages(packets)


# --------------------------------------------------------------------- #
# Ogg-Opus via libopus (RFC 7845)
# --------------------------------------------------------------------- #
def opus_available() -> bool:
    return _try_cdll("libopus.so.0", "libopus.so") is not None


def encode_ogg_opus(pcm: np.ndarray, sr: int = 16000) -> bytes:
    """mono float32 at 8/12/16/24/48 kHz → Ogg-Opus bytes."""
    op = _try_cdll("libopus.so.0", "libopus.so")
    if op is None:
        raise RuntimeError("libopus unavailable")
    op.opus_encoder_create.restype = ctypes.c_void_p
    err = ctypes.c_int(0)
    enc = ctypes.c_void_p(
        op.opus_encoder_create(sr, 1, 2049, ctypes.byref(err))  # OPUS_APPLICATION_AUDIO
    )
    assert err.value == 0, err.value
    frame = sr // 50  # 20 ms
    pcm = np.asarray(pcm, np.float32)
    pad = (-len(pcm)) % frame
    pcm = np.concatenate([pcm, np.zeros(pad, np.float32)])
    out = ctypes.create_string_buffer(4000)
    audio_packets = []
    for i in range(0, len(pcm), frame):
        seg = np.ascontiguousarray(pcm[i : i + frame])
        nb = op.opus_encode_float(
            enc,
            seg.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            frame,
            out,
            len(out),
        )
        assert nb > 0, nb
        audio_packets.append(out.raw[:nb])
    op.opus_encoder_destroy(enc)

    head = (
        b"OpusHead"
        + bytes([1, 1])  # version, channels
        + struct.pack("<H", 0)  # pre-skip
        + struct.pack("<I", sr)
        + struct.pack("<h", 0)  # gain
        + bytes([0])  # mapping family
    )
    tags = b"OpusTags" + struct.pack("<I", 4) + b"wis-" + struct.pack("<I", 0)
    packets = [head, tags] + audio_packets
    granules = [0, 0] + [
        (i + 1) * (48000 // 50) for i in range(len(audio_packets))
    ]
    return ogg_pages(packets, serial=0x5678, granules=granules)


# --------------------------------------------------------------------- #
# Ogg-Vorbis via libvorbisenc (caller-allocated structs oversized; only
# ogg_packet fields are read back: {packet*, bytes, b_o_s, e_o_s,
# granulepos, packetno})
# --------------------------------------------------------------------- #
def vorbis_available() -> bool:
    return (
        _try_cdll("libvorbisenc.so.2", "libvorbisenc.so") is not None
        and _try_cdll("libvorbis.so.0", "libvorbis.so") is not None
    )


class _OggPacket(ctypes.Structure):
    _fields_ = [
        ("packet", ctypes.POINTER(ctypes.c_ubyte)),
        ("bytes", ctypes.c_long),
        ("b_o_s", ctypes.c_long),
        ("e_o_s", ctypes.c_long),
        ("granulepos", ctypes.c_int64),
        ("packetno", ctypes.c_int64),
    ]


def encode_ogg_vorbis(pcm: np.ndarray, sr: int = 16000, q: float = 0.4) -> bytes:
    venc = _try_cdll("libvorbisenc.so.2", "libvorbisenc.so")
    vor = _try_cdll("libvorbis.so.0", "libvorbis.so")
    if venc is None or vor is None:
        raise RuntimeError("libvorbis unavailable")
    vi = ctypes.create_string_buffer(1024)
    vd = ctypes.create_string_buffer(8192)
    vb = ctypes.create_string_buffer(4096)
    vc = ctypes.create_string_buffer(1024)
    vor.vorbis_info_init(vi)
    assert venc.vorbis_encode_init_vbr(
        vi, ctypes.c_long(1), ctypes.c_long(sr), ctypes.c_float(q)
    ) == 0
    assert vor.vorbis_analysis_init(vd, vi) == 0
    assert vor.vorbis_block_init(vd, vb) == 0
    vor.vorbis_comment_init(vc)
    h0, h1, h2 = _OggPacket(), _OggPacket(), _OggPacket()
    assert vor.vorbis_analysis_headerout(
        vd, vc, ctypes.byref(h0), ctypes.byref(h1), ctypes.byref(h2)
    ) == 0

    def grab(op):
        return bytes(ctypes.string_at(op.packet, op.bytes)), op.granulepos

    packets = [grab(h0), grab(h1), grab(h2)]

    vor.vorbis_analysis_buffer.restype = ctypes.POINTER(
        ctypes.POINTER(ctypes.c_float)
    )
    pcm = np.asarray(pcm, np.float32)

    def drain():
        op = _OggPacket()
        while vor.vorbis_analysis_blockout(vd, vb) == 1:
            vor.vorbis_analysis(vb, None)
            vor.vorbis_bitrate_addblock(vb)
            while vor.vorbis_bitrate_flushpacket(vd, ctypes.byref(op)) == 1:
                packets.append(grab(op))

    step = 1024
    for i in range(0, len(pcm), step):
        seg = pcm[i : i + step]
        buf = vor.vorbis_analysis_buffer(vd, len(seg))
        ctypes.memmove(
            buf[0], seg.ctypes.data, len(seg) * 4
        )
        vor.vorbis_analysis_wrote(vd, len(seg))
        drain()
    vor.vorbis_analysis_wrote(vd, 0)
    drain()
    vor.vorbis_block_clear(vb)
    vor.vorbis_dsp_clear(vd)
    vor.vorbis_comment_clear(vc)
    vor.vorbis_info_clear(vi)
    data = [p for p, _ in packets]
    granules = [g if g > 0 else 0 for _, g in packets]
    return ogg_pages(data, serial=0x9ABC, granules=granules)
