"""WhisperEngine — the ASR task orchestrator.

TPU-native replacement for the reference's `do_whisper`/`do_translate`
pipeline (reference main.py:554-770, 514-547). Same request semantics —
per-request model/beam/task/language selection, ≥12 s long-mode beam
override, >30 s chunking with LCS merge, optional language detection and
speech→English translation, per-stage timing returned to the caller — but
restructured for XLA:

- **Compile-once programs**: encoder and decoder programs are built per
  (model, batch-bucket[, beam]) with static shapes and cached; requests
  pad up to the nearest bucket (replaces the reference's per-call
  CTranslate2 dispatch and `warm_models`, main.py:480-511).
- **One encoder pass per window group**: language detection, the
  transcribe pass, and the translate pass all consume the same resident
  cross-attention K/V (the reference re-encodes inside every CT2
  `generate`/`detect_language` call).
- **Translate correctness**: the reference's translate guard is broken
  (`len(total_chunk_count)` on an int, main.py:729 — raises whenever
  translate=True with chunking) and it returns only the first window's
  translation. Here translate runs over all windows and LCS-merges, per
  the documented intent (SURVEY.md "known reference quirks").
"""

from __future__ import annotations

import logging
import math
import re
import threading
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from wis_tpu.audio.chunking import Stride, chunk_iter, find_longest_common_sequence
from wis_tpu.audio.mel import SAMPLE_RATE, log_mel_spectrogram, pad_or_trim
from wis_tpu.decoding.beam import build_encode, build_generate_xa, trim_tokens
from wis_tpu.decoding.detect import build_detect_language_xa, lang_index_to_code
from wis_tpu.languages import to_language_code
from wis_tpu.models.whisper.tokenizer import build_prompt
from wis_tpu.runtime.residency import LoadedModel, ModelRegistry
from wis_tpu.settings import APISettings, get_api_settings
from wis_tpu.utils.timing import StageTimer

logger = logging.getLogger("wis_tpu")


@dataclass
class TranscriptionResult:
    """The reference's 6-tuple (main.py:763-770) plus structured timings."""

    language: str
    text: str
    infer_time_ms: float
    translation: Optional[str]
    infer_speedup: int
    audio_duration_ms: int
    timings: Dict[str, float] = field(default_factory=dict)

    def as_tuple(self):
        return (
            self.language,
            self.text,
            self.infer_time_ms,
            self.translation,
            self.infer_speedup,
            self.audio_duration_ms,
        )


class WhisperEngine:
    def __init__(
        self,
        registry: Optional[ModelRegistry] = None,
        settings: Optional[APISettings] = None,
    ):
        from wis_tpu.utils.compile_cache import enable_persistent_cache

        enable_persistent_cache()
        self.settings = settings or get_api_settings()
        self.registry = registry or ModelRegistry(self.settings)
        self._programs: Dict[tuple, object] = {}
        self._compile_lock = threading.Lock()
        # Serializes device work: JAX dispatch is thread-safe but ordering
        # compute explicitly keeps per-request latency predictable (the
        # dynamic batcher upstream owns cross-request coalescing).
        self.device_lock = threading.Lock()

    # ------------------------------------------------------------------ #
    # Program cache
    # ------------------------------------------------------------------ #
    def _program(self, kind: str, model: LoadedModel, **kw):
        key = (kind, model.name, tuple(sorted(kw.items())))
        prog = self._programs.get(key)
        if prog is not None:
            return prog
        with self._compile_lock:
            prog = self._programs.get(key)
            if prog is not None:
                return prog
            if kind == "encode":
                prog = build_encode(model.cfg)
            elif kind == "generate":
                tok = model.tokenizer
                prog = build_generate_xa(
                    model.cfg,
                    beam_size=kw["beam"],
                    batch=kw["batch"],
                    max_new_tokens=self.settings.max_decode_tokens,
                    prompt_len=kw["prompt_len"],
                    suppress_tokens=tok.suppress_tokens,
                    begin_suppress_tokens=tok.begin_suppress_tokens,
                )
            elif kind == "detect":
                prog = build_detect_language_xa(model.cfg)
            else:
                raise KeyError(kind)
            self._programs[key] = prog
            return prog

    def _bucket(self, n: int) -> int:
        for b in self.settings.batch_bucket_list():
            if n <= b:
                return b
        return self.settings.batch_bucket_list()[-1]

    # ------------------------------------------------------------------ #
    # Warmup — replaces warm_models (reference main.py:480-511): compile +
    # run the hot programs so first requests don't pay compile latency.
    # ------------------------------------------------------------------ #
    def warmup(
        self,
        models: Optional[List[str]] = None,
        beams: Optional[List[int]] = None,
    ) -> None:
        s = self.settings
        models = models or [s.whisper_model_default]
        beams = beams or sorted({s.beam_size, s.long_beam_size})
        audio = np.zeros(SAMPLE_RATE, dtype=np.float32)
        for name in models:
            for beam in beams:
                for _ in range(max(1, s.warmup_iterations)):
                    self.transcribe(audio, model=name, beam_size=beam)
        logger.info("ENGINE: warmup complete (%s x beams %s)", models, beams)

    # ------------------------------------------------------------------ #
    # The hot path
    # ------------------------------------------------------------------ #
    def transcribe(
        self,
        audio: np.ndarray,
        model: Optional[str] = None,
        beam_size: Optional[int] = None,
        task: str = "transcribe",
        detect_language: bool = False,
        force_language: Optional[str] = None,
        translate: bool = False,
        max_tokens: Optional[int] = None,
    ) -> TranscriptionResult:
        """audio: 1-D float32 PCM at 16 kHz (decode/resample happens in
        wis_tpu.audio.ingest, off the device path)."""
        s = self.settings
        timer = StageTimer()
        model_name = model or s.whisper_model_default
        beam = beam_size or s.beam_size

        loaded = self.registry.get(model_name)
        tok = loaded.tokenizer

        audio = np.asarray(audio, dtype=np.float32).reshape(-1)
        duration_ms = int(audio.shape[0] / SAMPLE_RATE * 1000)

        # long-mode beam override (reference main.py:582-586 — note it
        # intentionally overrides the *requested* beam)
        if duration_ms >= s.long_beam_size_threshold:
            beam = s.long_beam_size
        use_chunking = duration_ms > 30_000 and s.support_chunking
        if duration_ms > 30_000 and not s.support_chunking:
            logger.warning("ENGINE: audio > 30 s without chunking — truncating")

        # ---- features ---- #
        with timer.span("features"):
            strides: List[Stride] = []
            if use_chunking:
                windows = []
                for chunk, stride in chunk_iter(audio):
                    windows.append(pad_or_trim(chunk))
                    strides.append(stride)
                mel = log_mel_spectrogram(np.stack(windows))
            else:
                mel = log_mel_spectrogram(pad_or_trim(audio))[None]
        n_windows = mel.shape[0]

        # ---- group into static batch buckets ---- #
        group_size = self._bucket(min(n_windows, max(1, s.concurrent_gpu_chunks)))
        groups: List[np.ndarray] = []
        for i in range(0, n_windows, group_size):
            g = mel[i : i + group_size]
            if g.shape[0] < group_size:
                g = np.concatenate(
                    [g, np.zeros((group_size - g.shape[0],) + g.shape[1:], g.dtype)]
                )
            groups.append(g)

        encode_fn = self._program("encode", loaded)

        with self.device_lock:
            # ---- encode all window groups ---- #
            with timer.span("encode", trace=True):
                xa_kvs = [
                    encode_fn(loaded.params, jnp.asarray(g)) for g in groups
                ]

            # ---- language ---- #
            language = s.language
            detect_prob = None
            if detect_language and not force_language:
                with timer.span("detect_language", trace=True):
                    detect_fn = self._program(
                        "detect", loaded, batch=groups[0].shape[0]
                    )
                    idx, prob = detect_fn(loaded.params, xa_kvs[0])
                    language = lang_index_to_code(int(idx[0]))
                    detect_prob = float(prob[0])
                    logger.debug(
                        "ENGINE: detected language %s (p=%.3f)", language, detect_prob
                    )
            elif force_language:
                language = to_language_code(force_language)

            # ---- transcribe pass ---- #
            prompt_ids = build_prompt(language, task)
            gen_fn = self._program(
                "generate",
                loaded,
                beam=beam,
                batch=group_size,
                prompt_len=len(prompt_ids),
            )
            token_cap = jnp.int32(max_tokens or self.settings.max_decode_tokens)
            prompt = jnp.asarray(prompt_ids, jnp.int32)
            with timer.span("generate", trace=True):
                results = [
                    gen_fn(loaded.params, xa_kv, prompt, token_cap)
                    for xa_kv in xa_kvs
                ]
                # block on the last result; all prior work is ordered
                results[-1].tokens.block_until_ready()

            # ---- translate pass (reuses resident xa_kv) ---- #
            translation = None
            if translate:
                with timer.span("translate", trace=True):
                    tr_prompt_ids = build_prompt(language, "translate")
                    tr_fn = self._program(
                        "generate",
                        loaded,
                        beam=beam,
                        batch=group_size,
                        prompt_len=len(tr_prompt_ids),
                    )
                    tr_results = [
                        tr_fn(
                            loaded.params,
                            xa_kv,
                            jnp.asarray(tr_prompt_ids, jnp.int32),
                            token_cap,
                        )
                        for xa_kv in xa_kvs
                    ]
                    translation = self._merge_and_decode(
                        tr_results, n_windows, group_size, strides, tok
                    )

        # ---- merge + text decode ---- #
        with timer.span("decode_text"):
            text = self._merge_and_decode(
                results, n_windows, group_size, strides, tok
            )

        language = _normalize_language(language)
        infer_ms = timer.total_ms()
        speedup = math.floor(duration_ms / infer_ms) if infer_ms > 0 else 0
        return TranscriptionResult(
            language=language,
            text=text,
            infer_time_ms=infer_ms,
            translation=translation,
            infer_speedup=speedup,
            audio_duration_ms=duration_ms,
            timings=timer.as_dict(),
        )

    # ------------------------------------------------------------------ #
    # Coalesced path — called by the dynamic batcher with N compatible
    # short requests (same model + effective beam, each ≤ one 30 s
    # window); executes them as ONE padded TPU batch with per-sequence
    # prompts. No reference analog: the reference runs batch=1 per
    # request (main.py:1204-1215).
    # ------------------------------------------------------------------ #
    def transcribe_coalesced(self, requests) -> List[TranscriptionResult]:
        s = self.settings
        timer = StageTimer()
        model_name = requests[0].model
        beam = requests[0].effective_beam(s)
        loaded = self.registry.get(model_name)
        tok = loaded.tokenizer

        durations = [int(r.audio.shape[0] / SAMPLE_RATE * 1000) for r in requests]
        with timer.span("features"):
            windows = np.stack([pad_or_trim(r.audio) for r in requests])
            mel = log_mel_spectrogram(windows)
        n = mel.shape[0]
        bucket = self._bucket(n)
        if n < bucket:
            mel = np.concatenate(
                [mel, np.zeros((bucket - n,) + mel.shape[1:], mel.dtype)]
            )

        encode_fn = self._program("encode", loaded)
        with self.device_lock:
            with timer.span("encode", trace=True):
                xa_kv = encode_fn(loaded.params, jnp.asarray(mel))

            # per-request language resolution (one batched detect pass)
            languages = [s.language] * n
            need_detect = [
                i
                for i, r in enumerate(requests)
                if r.detect_language and not r.force_language
            ]
            if need_detect:
                with timer.span("detect_language", trace=True):
                    detect_fn = self._program("detect", loaded, batch=bucket)
                    idx, _prob = detect_fn(loaded.params, xa_kv)
                    idx = np.asarray(idx)
                for i in need_detect:
                    languages[i] = lang_index_to_code(int(idx[i]))
            for i, r in enumerate(requests):
                if r.force_language:
                    languages[i] = to_language_code(r.force_language)

            prompts = np.stack(
                [
                    build_prompt(languages[i] if i < n else s.language,
                                 requests[i].task if i < n else "transcribe")
                    for i in range(n)
                ]
                + [build_prompt(s.language, "transcribe")] * (bucket - n)
            ).astype(np.int32)
            gen_fn = self._program(
                "generate",
                loaded,
                beam=beam,
                batch=bucket,
                prompt_len=prompts.shape[1],
            )
            token_cap = jnp.int32(
                max((r.max_tokens or s.max_decode_tokens) for r in requests)
            )
            with timer.span("generate", trace=True):
                result = gen_fn(loaded.params, xa_kv, jnp.asarray(prompts), token_cap)
                result.tokens.block_until_ready()

            # translate second pass for any request that asked for it
            tr_texts: Dict[int, str] = {}
            want_tr = [i for i, r in enumerate(requests) if r.translate]
            if want_tr:
                with timer.span("translate", trace=True):
                    tr_prompts = prompts.copy()
                    for i in want_tr:
                        tr_prompts[i] = np.asarray(
                            build_prompt(languages[i], "translate"), np.int32
                        )
                    tr_res = gen_fn(
                        loaded.params, xa_kv, jnp.asarray(tr_prompts), token_cap
                    )
                    tr_tokens = np.asarray(tr_res.tokens)
                    tr_lengths = np.asarray(tr_res.lengths)
                    tr_best = np.asarray(tr_res.best)
                    for i in want_tr:
                        k = int(tr_best[i])
                        tr_texts[i] = tok.decode(
                            trim_tokens(tr_tokens[i, k], int(tr_lengths[i, k]))
                        ).strip()

        with timer.span("decode_text"):
            tokens = np.asarray(result.tokens)
            lengths = np.asarray(result.lengths)
            best = np.asarray(result.best)
            infer_ms = timer.total_ms()
            out: List[TranscriptionResult] = []
            for i in range(n):
                k = int(best[i])
                text = tok.decode(trim_tokens(tokens[i, k], int(lengths[i, k]))).strip()
                speedup = (
                    math.floor(durations[i] / infer_ms) if infer_ms > 0 else 0
                )
                out.append(
                    TranscriptionResult(
                        language=_normalize_language(languages[i]),
                        text=text,
                        infer_time_ms=infer_ms,
                        translation=tr_texts.get(i),
                        infer_speedup=speedup,
                        audio_duration_ms=durations[i],
                        timings=timer.as_dict(),
                    )
                )
        return out

    # ------------------------------------------------------------------ #
    def _merge_and_decode(
        self, results, n_windows: int, group_size: int, strides, tok
    ) -> str:
        """Pick best beams, trim at EOT, LCS-merge chunked windows
        (reference main.py:704-714), decode to text."""
        seqs: List[np.ndarray] = []
        for gi, res in enumerate(results):
            tokens = np.asarray(res.tokens)
            lengths = np.asarray(res.lengths)
            best = np.asarray(res.best)
            for bi in range(tokens.shape[0]):
                widx = gi * group_size + bi
                if widx >= n_windows:
                    break
                k = int(best[bi])
                seqs.append(trim_tokens(tokens[bi, k], int(lengths[bi, k])))
        if strides and len(seqs) > 1:
            merged = find_longest_common_sequence(
                list(zip(seqs, strides)), tok.all_special_ids
            )
        else:
            merged = seqs[0]
        return tok.decode(merged).strip()


_LANG_RE = re.compile(r"[A-Za-z0-9]+")


def _normalize_language(language: str) -> str:
    """Strip token decoration like <|en|> (reference main.py:723-725)."""
    m = _LANG_RE.findall(language)
    return m[0] if m else language
