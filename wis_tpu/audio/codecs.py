"""ctypes binding to the native libwisaudio codec/DSP library.

The reference reaches FFmpeg through PyAV for container decode (reference
main.py:108-120) and libsoxr through librosa for resampling (main.py:579).
Here both live in the in-repo C++ library ``native/wisaudio`` (FLAC, WAV,
raw PCM, µ-law/A-law, windowed-sinc resample, mixdown), compiled on first
use with the repo Makefile and loaded via ctypes. A pure-Python WAV/PCM
fallback keeps ingest functional if no C++ toolchain is available
(FLAC requires the native library).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger("wis_tpu")

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libwisaudio.so"))

_lib = None
_lib_lock = threading.Lock()


class CodecError(RuntimeError):
    pass


def _build_library() -> bool:
    makefile = os.path.join(_NATIVE_DIR, "Makefile")
    if not os.path.isfile(makefile):
        return False
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.isfile(_LIB_PATH)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired) as e:
        logger.warning("CODECS: native build failed: %s", e)
        return False


def _load_library() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.isfile(_LIB_PATH) and not _build_library():
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        c_float_p = ctypes.POINTER(ctypes.c_float)
        for name in (
            "wisaudio_decode_flac",
            "wisaudio_decode_wav",
            "wisaudio_decode_mp3",
            "wisaudio_decode_ogg",
        ):
            fn = getattr(lib, name)
            fn.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.POINTER(c_float_p),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
            ]
            fn.restype = ctypes.c_int
        lib.wisaudio_pcm_to_float.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.c_int32,
            ctypes.POINTER(c_float_p),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.wisaudio_pcm_to_float.restype = ctypes.c_int
        lib.wisaudio_resample.argtypes = [
            c_float_p,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(c_float_p),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.wisaudio_resample.restype = ctypes.c_int
        lib.wisaudio_mix_to_mono.argtypes = [
            c_float_p,
            ctypes.c_int64,
            ctypes.c_int32,
            c_float_p,
        ]
        lib.wisaudio_mix_to_mono.restype = ctypes.c_int
        lib.wisaudio_free.argtypes = [ctypes.c_void_p]
        lib.wisaudio_free.restype = None
        _lib = lib
        logger.info("CODECS: loaded native library %s", _LIB_PATH)
        return _lib


def native_available() -> bool:
    return _load_library() is not None


def _take_buffer(lib, ptr, n: int) -> np.ndarray:
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    lib.wisaudio_free(ptr)
    return arr


def _decode_via(fn_name: str, data: bytes) -> Tuple[np.ndarray, int, int]:
    lib = _load_library()
    if lib is None:
        raise CodecError("native wisaudio library unavailable")
    out = ctypes.POINTER(ctypes.c_float)()
    n_frames = ctypes.c_int64()
    channels = ctypes.c_int32()
    sr = ctypes.c_int32()
    rc = getattr(lib, fn_name)(
        data,
        len(data),
        ctypes.byref(out),
        ctypes.byref(n_frames),
        ctypes.byref(channels),
        ctypes.byref(sr),
    )
    if rc != 0:
        raise CodecError(f"{fn_name} failed with code {rc}")
    pcm = _take_buffer(lib, out, n_frames.value * channels.value)
    return pcm.reshape(n_frames.value, channels.value), channels.value, sr.value


def decode_flac(data: bytes) -> Tuple[np.ndarray, int, int]:
    """FLAC bytes → ((frames, channels) float32, channels, sample_rate)."""
    return _decode_via("wisaudio_decode_flac", data)


def decode_mp3(data: bytes) -> Tuple[np.ndarray, int, int]:
    """MP3 bytes → ((frames, channels) float32, channels, sample_rate).

    Decoded by the system libmpg123 through native/wisaudio (the
    reference reaches the same decoder family through FFmpeg/PyAV,
    main.py:108-120); raises CodecError(-5) when the host lacks it."""
    return _decode_via("wisaudio_decode_mp3", data)


def decode_ogg(data: bytes) -> Tuple[np.ndarray, int, int]:
    """Ogg bytes (Vorbis / Opus / Ogg-FLAC) → ((frames, channels)
    float32, channels, sample_rate)."""
    return _decode_via("wisaudio_decode_ogg", data)


def decode_wav(data: bytes) -> Tuple[np.ndarray, int, int]:
    """WAV bytes → ((frames, channels) float32, channels, sample_rate)."""
    if native_available():
        return _decode_via("wisaudio_decode_wav", data)
    return _decode_wav_python(data)


def pcm_to_float(data: bytes, bits: int) -> np.ndarray:
    """Raw signed little-endian PCM → float32 (Willow 'pcm' codec,
    reference main.py:98-105)."""
    lib = _load_library()
    if lib is None:
        return _pcm_to_float_python(data, bits)
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    rc = lib.wisaudio_pcm_to_float(
        data, len(data), bits, ctypes.byref(out), ctypes.byref(n)
    )
    if rc != 0:
        raise CodecError(f"pcm_to_float failed with code {rc}")
    return _take_buffer(lib, out, n.value)


def mix_to_mono(pcm: np.ndarray) -> np.ndarray:
    """(frames, channels) → (frames,) mean mixdown."""
    pcm = np.ascontiguousarray(pcm, dtype=np.float32)
    if pcm.ndim == 1 or pcm.shape[1] == 1:
        return pcm.reshape(-1)
    lib = _load_library()
    if lib is None:
        return pcm.mean(axis=1)
    out = np.empty(pcm.shape[0], dtype=np.float32)
    rc = lib.wisaudio_mix_to_mono(
        pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pcm.shape[0],
        pcm.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise CodecError(f"mix_to_mono failed with code {rc}")
    return out


def resample(pcm: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Mono float32 resample via the native windowed-sinc kernel."""
    pcm = np.ascontiguousarray(pcm, dtype=np.float32).reshape(-1)
    if sr_in == sr_out:
        return pcm
    lib = _load_library()
    if lib is None:
        return _resample_python(pcm, sr_in, sr_out)
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    rc = lib.wisaudio_resample(
        pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pcm.shape[0],
        sr_in,
        sr_out,
        ctypes.byref(out),
        ctypes.byref(n),
    )
    if rc != 0:
        raise CodecError(f"resample failed with code {rc}")
    return _take_buffer(lib, out, n.value)


# --------------------------------------------------------------------------- #
# Pure-Python fallbacks (no FLAC — that needs the native library)
# --------------------------------------------------------------------------- #
def _decode_wav_python(data: bytes) -> Tuple[np.ndarray, int, int]:
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as w:
        nch = w.getnchannels()
        sr = w.getframerate()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 2:
        pcm = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        pcm = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128) / 128.0
    elif width == 4:
        pcm = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise CodecError(f"unsupported WAV sample width {width}")
    return pcm.reshape(-1, nch), nch, sr


def _pcm_to_float_python(data: bytes, bits: int) -> np.ndarray:
    if bits == 16:
        return np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    if bits == 8:
        return np.frombuffer(data, dtype=np.int8).astype(np.float32) / 128.0
    if bits == 32:
        return np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
    raise CodecError(f"unsupported PCM bit depth {bits}")


def _resample_python(pcm: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    from scipy.signal import resample_poly

    from math import gcd

    g = gcd(sr_in, sr_out)
    return resample_poly(pcm, sr_out // g, sr_in // g).astype(np.float32)
