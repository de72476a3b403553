"""Fully-fused ASR program: ONE device dispatch per request/batch.

The split pipeline (mel → encode → detect → generate) costs a host↔device
round-trip per stage plus one per result array. This program fuses the
entire request into a single XLA computation taking raw padded audio and
returning one packed int32 buffer:

    audio (B, 480000) f32
      → log-mel (f32 DFT matmuls)
      → encoder + cross-KV
      → [static variant] language detect; prompt's lang token replaced
        on-device with the detected one
      → prompt prefill + beam-search while_loop
      → packed int32 (B, K*max_new + K + 3):
          [tokens (K*max_new)] [lengths (K)] [best] [lang_idx] [lang_prob‰]

One input transfer, one dispatch, one output fetch — the minimum possible
host involvement (the reference pays a Python→C++ hop per stage,
main.py:633-693, plus result marshalling).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wis_tpu.audio.mel import N_SAMPLES, _log_mel_jax
from wis_tpu.decoding.beam import build_generate_xa
from wis_tpu.decoding.detect import N_LANG, _detect_from_kv
from wis_tpu.models.whisper.config import WhisperConfig
from wis_tpu.models.whisper.model import cross_kv, encode
from wis_tpu.models.whisper.tokenizer import LANG_BASE


def build_asr_program(
    cfg: WhisperConfig,
    *,
    beam_size: int,
    batch: int,
    max_new_tokens: int,
    prompt_len: int,
    suppress_tokens: Tuple[int, ...],
    begin_suppress_tokens: Tuple[int, ...],
    detect_language: bool = False,
    translate: bool = False,
    length_penalty: float = 1.0,
    with_timestamps: bool = False,
    fused_step: bool = False,
    xa_int8: bool = False,
    n_samples: int = N_SAMPLES,
    chunked: bool = False,
):
    """Return jitted asr(params, audio_i16 (B, n_samples), ctl (B, P+2))
    → packed int32 (B, W) with W = K*max_new + K + 3, doubled
    (transcribe ++ translate halves) when translate=True.

    chunked=True — the long-form variant: audio_i16 is ONE (n_samples,)
    contiguous segment and the 22 s / 4 s-stride windows are extracted
    ON DEVICE (static slice starts at multiples of the 14 s step, each
    zero-padded to the 30 s mel window — bit-identical to the host
    chunk_iter + pad_or_trim). A 3-minute transcription becomes one
    transfer of the raw samples and one dispatch, instead of shipping
    every overlapping window (~2× the bytes) across one dispatch per
    window group (reference main.py:614-631 loops chunks through the
    GPU in concurrent_gpu_chunks groups).

    The host↔device boundary is TWO transfers, sized to the content:

    - audio crosses as int16 (the source bit depth — halves the bytes)
      at a bucketed length `n_samples` ≤ 30 s; zero-padding to the full
      window happens ON DEVICE (identical to the host pad_or_trim).
      Through a network device tunnel each transferred megabyte costs
      ~10 ms and each extra array an RPC round — shipping the padded
      480000-sample window for a 4 s utterance tripled the request's
      fixed cost (BENCH.md r3).
    - ctl packs prompt ‖ detect_mask ‖ token_cap into one int32 array:
      columns [0:P) per-row prompts, [P] the per-row detect mask (rows
      with a forced/default language keep their prompt token and report
      lang_idx −1), [P+1] the runtime token cap (row 0 is read).

    fused_step=True (TPU programs): the decode loop runs the all-layers
    Pallas kernel (ops/fused_decode); the program then takes a `packed`
    PackedDecoder argument right after `params`.
    """
    from wis_tpu.models.whisper.tokenizer import layout_for_vocab

    TRANSLATE = layout_for_vocab(cfg.n_vocab).translate

    K = beam_size
    gen = build_generate_xa(
        cfg,
        beam_size=beam_size,
        batch=batch,
        max_new_tokens=max_new_tokens,
        prompt_len=prompt_len,
        suppress_tokens=suppress_tokens,
        begin_suppress_tokens=begin_suppress_tokens,
        length_penalty=length_penalty,
        with_timestamps=with_timestamps,
        fused=fused_step,
        xa_int8=fused_step and xa_int8,
    )

    def _asr(params, packed_dec, audio_i16, ctl):
        prompt = ctl[:, :prompt_len]
        detect_mask = ctl[:, prompt_len]
        token_cap = ctl[0, prompt_len + 1]
        if chunked:
            from wis_tpu.audio.chunking import (
                CHUNK_LEN,
                STRIDE_LEFT,
                STRIDE_RIGHT,
            )

            step = CHUNK_LEN - STRIDE_LEFT - STRIDE_RIGHT
            long_audio = audio_i16.astype(jnp.float32) / 32768.0
            audio = jnp.stack(
                [
                    jax.lax.dynamic_slice(long_audio, (w * step,), (CHUNK_LEN,))
                    for w in range(batch)
                ]
            )
            audio = jnp.pad(audio, ((0, 0), (0, N_SAMPLES - CHUNK_LEN)))
        else:
            audio = audio_i16.astype(jnp.float32) / 32768.0
            if n_samples < N_SAMPLES:
                audio = jnp.pad(audio, ((0, 0), (0, N_SAMPLES - n_samples)))
        mel = _log_mel_jax(audio, n_mels=cfg.n_mels)  # (B, 80, 3000)
        xa = encode(params, mel, cfg)
        xa_kv = cross_kv(params, xa, cfg)

        if detect_language:
            lang_idx, lang_prob = _detect_from_kv(params, xa_kv, cfg)
            row_detects = detect_mask.astype(bool)
            prompt = prompt.at[:, 1].set(
                jnp.where(row_detects, LANG_BASE + lang_idx, prompt[:, 1])
            )
            lang_idx = jnp.where(row_detects, lang_idx, -1)
            lang_prob = jnp.where(row_detects, lang_prob, 0.0)
        else:
            lang_idx = jnp.full((batch,), -1, jnp.int32)
            lang_prob = jnp.zeros((batch,), jnp.float32)

        def pack(result):
            return jnp.concatenate(
                [
                    result.tokens.reshape(batch, K * max_new_tokens),
                    result.lengths.astype(jnp.int32),
                    result.best[:, None],
                    lang_idx[:, None],
                    (lang_prob * 1000).astype(jnp.int32)[:, None],
                ],
                axis=1,
            )

        def run(p):
            if fused_step:
                return gen(params, packed_dec, xa_kv, p, token_cap)
            return gen(params, xa_kv, p, token_cap)

        packed = pack(run(prompt))
        if translate:
            tr_prompt = prompt.at[:, 2].set(TRANSLATE)
            packed = jnp.concatenate(
                [packed, pack(run(tr_prompt))], axis=1
            )
        return packed

    if fused_step:

        @jax.jit
        def asr(params, packed_dec, audio_i16, ctl):
            return _asr(params, packed_dec, audio_i16, ctl)

    else:

        @jax.jit
        def asr(params, audio_i16, ctl):
            return _asr(params, None, audio_i16, ctl)

    return asr


def pack_ctl(prompts: np.ndarray, detect_mask: np.ndarray,
             token_cap: int) -> np.ndarray:
    """Host-side: prompts (B, P) ‖ detect_mask (B,) ‖ token_cap → (B, P+2)
    int32, the program's single small transfer."""
    b = prompts.shape[0]
    return np.concatenate(
        [
            np.asarray(prompts, np.int32),
            np.asarray(detect_mask, np.int32).reshape(b, 1),
            np.full((b, 1), token_cap, np.int32),
        ],
        axis=1,
    )


def unpack_asr_result(packed: np.ndarray, beam_size: int, max_new_tokens: int):
    """Host-side unpack of one packed half → (tokens (B,K,max), lengths
    (B,K), best (B,), lang_idx (B,), lang_prob (B,))."""
    b = packed.shape[0]
    k = beam_size
    tokens = packed[:, : k * max_new_tokens].reshape(b, k, max_new_tokens)
    lengths = packed[:, k * max_new_tokens : k * max_new_tokens + k]
    best = packed[:, k * max_new_tokens + k]
    lang_idx = packed[:, k * max_new_tokens + k + 1]
    lang_prob = packed[:, k * max_new_tokens + k + 2].astype(np.float32) / 1000.0
    return tokens, lengths, best, lang_idx, lang_prob


def packed_width(beam_size: int, max_new_tokens: int) -> int:
    return beam_size * max_new_tokens + beam_size + 3
