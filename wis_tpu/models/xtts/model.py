"""XTTS orchestrator: text → streaming 24 kHz speech with custom voices.

TPU-native rebuild of Coqui XTTS v2's inference surface (reference
xtts/main.py): speaker latents (`gpt_cond_latent` (N,1024) +
`speaker_embedding` (512), persisted as JSON per voice, xtts/main.py:
185-198), `inference_stream`-style chunked generation (149-163, 201-211),
and voice cloning from reference audio (62-74, 329-355).

Streaming pipeline per chunk (stream_chunk_size tokens, default 20):
ONE fused device dispatch runs the GPT decode chunk AND the HiFi-GAN
vocoder (incl. Coqui HifiDecoder's latent-timeline interpolations —
one token ≈ 1114.6 samples ≈ 46.4 ms at 24 kHz); everything the host
needs comes back in ONE packed float32 fetch (wav ‖ valid ‖ done) while
decode state chains device-resident, and chunk i+1 is dispatched before
chunk i is fetched so the tunnel round-trip hides behind device
compute. Host side: crossfade over `overlap_wav_len` samples → yield
PCM. One dispatch per ~929 ms of audio keeps the dispatch rate far
below realtime even through a high-latency device tunnel.
"""

from __future__ import annotations

import logging
import os
import threading
from dataclasses import dataclass, field
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wis_tpu.models.xtts.gpt import (
    GPTCache,
    GPTConfig,
    build_decode_chunk,
    build_prefill,
    flatten_gpt_cache,
    random_gpt,
    run_decode_chunk,
    run_decode_chunk_fused,
)
from wis_tpu.models.xtts.hifigan import (
    HiFiGANConfig,
    hifigan_forward,
    random_hifigan,
)

logger = logging.getLogger("wis_tpu")

#: XTTS v2 supported language codes (reference xtts/main.py WillowStreamingInputs)
XTTS_LANGUAGES = (
    "en", "es", "fr", "de", "it", "pt", "pl", "tr", "ru", "nl", "cs", "ar",
    "zh-cn", "hu", "ko", "ja",
)


@dataclass(frozen=True)
class XTTSConfig:
    gpt: GPTConfig = field(default_factory=GPTConfig)
    vocoder: HiFiGANConfig = field(default_factory=HiFiGANConfig)
    text_buckets: tuple = (32, 64, 128, 256, 400)
    cond_len: int = 32
    left_context_frames: int = 2  # vocoder left context per chunk
    #: fused-GPT KV slab length buckets (t_pad candidates, lane-aligned).
    #: The fused step streams the FULL t_pad-wide slabs every token
    #: (~189 MB/token at 768) regardless of fill; short utterances run in
    #: the smallest slab that holds them and the cache grows (one padded
    #: device copy, host-predicted — pos advances exactly `chunk` per
    #: dispatch) only when the next chunk would overflow. Analogous to
    #: the ASR decode-length buckets (runtime/engine.py).
    gpt_cache_buckets: tuple = (256, 512)


class XTTSModel:
    def __init__(
        self,
        model_dir: Optional[str] = None,
        cfg: Optional[XTTSConfig] = None,
        dtype=jnp.bfloat16,
        seed: int = 0,
        quant: str = "int8",
    ):
        from wis_tpu.utils.compile_cache import enable_persistent_cache

        # Same persistent XLA cache the ASR engine uses (engine.py:94-96):
        # a standalone TTS process (wisctl run-tts, tts_app) must not pay
        # the multi-minute remote first-compile on every boot.
        enable_persistent_cache()
        self.cfg = cfg or XTTSConfig()
        self.dtype = dtype
        self._programs: Dict[tuple, object] = {}
        self._lock = threading.Lock()
        self._tokenizer = self._load_tokenizer(model_dir)
        # weights: converted Coqui checkpoint if present, else seeded random
        self.gpt_params = None
        self.vocoder_params = None
        ckpt = os.path.join(model_dir or "", "model.pth")
        if model_dir and os.path.isfile(ckpt):
            from wis_tpu.models.xtts.convert import (
                gpt_from_coqui,
                hifigan_from_coqui,
                load_coqui_checkpoint,
            )

            sd = load_coqui_checkpoint(ckpt)
            if sd:
                try:
                    self.gpt_params = gpt_from_coqui(sd, self.cfg.gpt, dtype)
                    self.vocoder_params = hifigan_from_coqui(
                        sd, self.cfg.vocoder, dtype
                    )
                    logger.info("XTTS: loaded Coqui checkpoint %s", ckpt)
                except (KeyError, ValueError) as e:
                    logger.warning("XTTS: checkpoint conversion failed: %s", e)
                try:
                    from wis_tpu.models.xtts.convert import conditioning_from_coqui

                    cond = conditioning_from_coqui(sd, self._cond_cfg(), jnp.float32)
                    cond.pop("_unmapped", None)
                    self._cond_params = cond
                    logger.info("XTTS: loaded conditioning encoder from checkpoint")
                except (KeyError, ValueError) as e:
                    logger.warning(
                        "XTTS: conditioning conversion failed (%s) — "
                        "clone_speaker falls back to random init", e
                    )
        if self.gpt_params is None:
            logger.warning("XTTS: using seeded random init (no checkpoint)")
            self.gpt_params = random_gpt(self.cfg.gpt, seed=seed, dtype=dtype)
            self.vocoder_params = random_hifigan(
                self.cfg.vocoder, seed=seed + 1, dtype=dtype
            )
        if quant == "int8":
            # the chunked decode streams the full block stack per audio
            # token — weight-bound like the whisper decoder, where int8
            # is the production default (settings.quant; the reference
            # itself serves CT2 int8_float16). XTTS_QUANT=none keeps
            # bf16 weights.
            from wis_tpu.ops.quant import quantize_gpt_params

            self.gpt_params = quantize_gpt_params(self.gpt_params)
        # Fused Pallas GPT decode (ops/fused_gpt.py): all 30 layers per
        # token in ONE launch with the hand-rolled weight/cache DMA
        # pipeline — the TPU analog of the DeepSpeed inference kernels
        # the reference's XTTS container enables (xtts/main.py:25-49).
        # XTTS_FUSED=1/0 forces; default "auto" = on TPU only (the XLA
        # scan path remains the CPU/tests path and the fallback).
        self._fused = self._fused_gpt_enabled()
        self.gpt_packed = None
        self.gpt_head_packed = None
        if self._fused:
            from wis_tpu.ops.fused_gpt import pack_gpt
            from wis_tpu.ops.fused_gpt_head import pack_head

            self.gpt_packed = pack_gpt(self.gpt_params, self.cfg.gpt)
            self.gpt_head_packed = pack_head(
                self.gpt_params, self.cfg.gpt, self.dtype
            )

    @staticmethod
    def _fused_gpt_enabled() -> bool:
        mode = os.environ.get("XTTS_FUSED", "auto").lower()
        if mode in ("1", "on", "true"):
            return True
        if mode in ("0", "off", "false", "none"):
            return False
        try:
            platform = jax.devices()[0].platform
        except RuntimeError:
            return False
        return platform in ("tpu", "axon")

    # ------------------------------------------------------------------ #
    def _load_tokenizer(self, model_dir):
        path = os.path.join(model_dir or "", "tokenizer.json")
        if model_dir and os.path.isfile(path):
            try:
                from tokenizers import Tokenizer

                return Tokenizer.from_file(path)
            except Exception as e:  # noqa: BLE001
                logger.warning("XTTS: tokenizer load failed: %s", e)
        return None

    def tokenize(self, text: str, language: str) -> np.ndarray:
        """XTTS prompts are `[lang]text` over its BPE; the text first runs
        the Coqui-contract cleaner pipeline (textnorm.preprocess_text:
        quotes/lowercase/number/abbreviation/symbol/whitespace — the stage
        the reference gets from Coqui's VoiceBpeTokenizer). Placeholder
        fallback maps bytes deterministically into the text vocab when no
        tokenizer.json is present."""
        from wis_tpu.models.xtts.textnorm import preprocess_text

        prompt = f"[{language}]{preprocess_text(text, language)}"
        if self._tokenizer is not None:
            ids = self._tokenizer.encode(prompt).ids
        else:
            ids = [7 + (b % (self.cfg.gpt.n_text_vocab - 10)) for b in prompt.encode()]
        return np.asarray(ids[: self.cfg.gpt.max_text_tokens], np.int32)

    # ------------------------------------------------------------------ #
    def _text_bucket(self, n: int) -> int:
        for b in self.cfg.text_buckets:
            if n <= b:
                return b
        return self.cfg.text_buckets[-1]

    def _program(self, kind: str, **kw):
        key = (kind, tuple(sorted(kw.items())))
        prog = self._programs.get(key)
        if prog is not None:
            return prog
        with self._lock:
            prog = self._programs.get(key)
            if prog is not None:
                return prog
            g = self.cfg.gpt
            max_len = self.cfg.cond_len + kw.get("text_len", 0) + 1 + g.max_audio_tokens
            if kind == "prefill":
                prog = build_prefill(
                    g, batch=1, cond_len=self.cfg.cond_len,
                    text_len=kw["text_len"], max_len=max_len,
                )
            elif kind == "decode":
                prog = build_decode_chunk(
                    g, batch=1, chunk=kw["chunk"], max_len=max_len
                )
            elif kind == "decode_vocode":
                # The streaming hot path: GPT chunk decode AND the
                # HiFi-GAN vocoder in ONE dispatch. Through the device
                # tunnel every dispatch+fetch round costs ~27 ms; fusing
                # removes a dispatch, a latents round-trip, and the
                # eager concat/astype ops between the two programs.
                #
                # Everything the host needs per chunk rides in ONE
                # fetchable float32 array (wav ‖ valid ‖ done) — a single
                # d2h round — while all decode state (cache, last token,
                # history, PRNG key, vocoder left context) stays
                # device-resident, so the next chunk can be dispatched
                # speculatively before this one is fetched.
                from functools import partial as _partial

                chunk = kw["chunk"]
                left = self.cfg.left_context_frames
                voc_cfg = self.cfg.vocoder
                run = _partial(run_decode_chunk, cfg=g, chunk=chunk, batch=1)

                @_partial(jax.jit, donate_argnums=(3,))
                def decode_vocode(
                    params, voc_params, ctx, cache, last, history,
                    hist_len, speaker, key, t_, tk, tp, rp, ds, mt,
                ):
                    key, sub = jax.random.split(key)
                    tokens, latents, cache, history, hist_len, done = run(
                        params, last, cache, history, hist_len, sub,
                        t_, tk, tp, rp, ds, mt,
                    )
                    voc_in = jnp.concatenate(
                        [ctx, latents], axis=1
                    ).astype(speaker.dtype)
                    wav = hifigan_forward(voc_params, voc_in, speaker, voc_cfg)
                    new_ctx = latents[:, -left:]
                    # valid = tokens before the first stop in this chunk
                    is_stop = tokens[0] == g.stop_audio_token
                    valid = jnp.where(
                        is_stop.any(), jnp.argmax(is_stop), jnp.int32(chunk)
                    )
                    packed = jnp.concatenate(
                        [
                            wav[0].astype(jnp.float32),
                            valid.astype(jnp.float32)[None],
                            done[0].astype(jnp.float32)[None],
                        ]
                    )
                    state = (new_ctx, cache, tokens[:, -1], history, hist_len, key)
                    return packed, state

                prog = decode_vocode
            elif kind == "decode_vocode_fused":
                # decode_vocode with the per-token layer scan replaced by
                # the fused Pallas step (ops/fused_gpt.py): one kernel
                # launch per token instead of ~8 XLA kernels per layer.
                # State carries the kernel-layout flat caches + position.
                from functools import partial as _partial

                from wis_tpu.ops.fused_gpt import build_fused_gpt_step
                from wis_tpu.ops.fused_gpt_head import build_fused_gpt_head

                chunk = kw["chunk"]
                t_pad = kw["t_pad"]
                left = self.cfg.left_context_frames
                voc_cfg = self.cfg.vocoder
                step_fn = build_fused_gpt_step(g, bk=1, t_cache=t_pad)
                # OPT-IN second Pallas launch per token running the whole
                # sampling epilogue (double LN + head + penalty + top-k/p
                # + draw). Measured on v5e (probe_fused_gpt_floor):
                # the XLA epilogue costs only 0.05 ms/token inside the
                # chunk scan while this kernel costs 0.14 — XLA wins, so
                # the default is OFF (the int8-Pallas-matmul precedent:
                # validated, kept as the measured alternative).
                head_on = os.environ.get("XTTS_FUSED_HEAD", "0").lower() in (
                    "1", "on", "true",
                )
                head_fn = (
                    build_fused_gpt_head(g, dtype=self.dtype) if head_on else None
                )
                run = _partial(
                    run_decode_chunk_fused, cfg=g, chunk=chunk, batch=1,
                    head_fn=head_fn,
                )

                @_partial(jax.jit, donate_argnums=(4, 5))
                def decode_vocode_fused(
                    params, packed, head_packed, voc_params, kc, vc, pos,
                    ctx, last, history, hist_len, speaker, key, t_, tk, tp,
                    rp, ds, mt,
                ):
                    key, sub = jax.random.split(key)
                    tokens, latents, kc, vc, pos, history, hist_len, done = (
                        run(
                            params, packed, step_fn, last, kc, vc, pos,
                            history, hist_len, sub, t_, tk, tp, rp, ds, mt,
                            head_packed,
                        )
                    )
                    voc_in = jnp.concatenate(
                        [ctx, latents], axis=1
                    ).astype(speaker.dtype)
                    wav = hifigan_forward(voc_params, voc_in, speaker, voc_cfg)
                    new_ctx = latents[:, -left:]
                    is_stop = tokens[0] == g.stop_audio_token
                    valid = jnp.where(
                        is_stop.any(), jnp.argmax(is_stop), jnp.int32(chunk)
                    )
                    packed_out = jnp.concatenate(
                        [
                            wav[0].astype(jnp.float32),
                            valid.astype(jnp.float32)[None],
                            done[0].astype(jnp.float32)[None],
                        ]
                    )
                    state = (
                        new_ctx, kc, vc, pos, tokens[:, -1], history,
                        hist_len, key,
                    )
                    return packed_out, state

                prog = decode_vocode_fused
            elif kind == "flatten":
                t_pad = kw["t_pad"]

                @jax.jit
                def flatten(cache):
                    return flatten_gpt_cache(cache, t_pad)

                prog = flatten
            elif kind == "grow":
                # KV slab growth between cache-length buckets: one padded
                # device copy (~0.05 ms at 256→512), pipelined like any
                # other chunk dispatch
                from functools import partial as _partial

                t_from, t_to = kw["t_from"], kw["t_to"]
                assert t_to > t_from

                @_partial(jax.jit, donate_argnums=(0, 1))
                def grow(kc, vc):
                    pad = ((0, 0), (0, 0), (0, t_to - t_from))
                    return jnp.pad(kc, pad), jnp.pad(vc, pad)

                prog = grow
            elif kind == "vocoder":
                frames = kw["frames"]

                @jax.jit
                def vocode(params, latents, speaker):
                    return hifigan_forward(params, latents, speaker, self.cfg.vocoder)

                prog = vocode
            else:
                raise KeyError(kind)
            self._programs[key] = prog
            return prog

    # ------------------------------------------------------------------ #
    # Voice cloning (reference xtts/main.py:62-74): reference audio →
    # (gpt_cond_latent, speaker_embedding). gpt_cond_latent comes from the
    # conditioning encoder + perceiver resampler (XTTS's
    # get_conditioning_latents architecture, models/xtts/conditioning.py).
    # ------------------------------------------------------------------ #
    def _cond_cfg(self):
        from wis_tpu.models.xtts.conditioning import ConditioningConfig

        g = self.cfg.gpt
        return ConditioningConfig(
            n_mels=80,
            d_model=g.d_model,
            n_heads=g.n_head,
            n_blocks=min(6, g.n_layer),
            n_latents=self.cfg.cond_len,
            n_groups=min(32, g.d_model // 4),
            perceiver_heads=min(8, g.n_head),
            perceiver_depth=2,
        )

    def _conditioning(self):
        from wis_tpu.models.xtts.conditioning import (
            build_clone_program,
            random_conditioning,
        )

        if not hasattr(self, "_cond_params"):
            self._cond_params = random_conditioning(
                self._cond_cfg(), dtype=jnp.float32
            )
        if not hasattr(self, "_cond_program"):
            self._cond_program = build_clone_program(self._cond_cfg())
        return self._cond_program, self._cond_params

    def _speaker_embedding(self, audio_16k: np.ndarray) -> np.ndarray:
        """Vocoder-path speaker embedding: the in-repo WavLM x-vector
        (TPU-native stand-in for Coqui's bundled ResNet speaker encoder,
        the same embedder that powers /api/sv)."""
        cdim = self.cfg.vocoder.cond_dim
        if not hasattr(self, "_spk_embed_fn"):
            from wis_tpu.models.wavlm import default_embedder

            self._spk_embed_fn = default_embedder()
        emb = np.asarray(self._spk_embed_fn(audio_16k), np.float32).reshape(-1)
        if emb.shape[0] < cdim:
            emb = np.pad(emb, (0, cdim - emb.shape[0]))
        emb = emb[:cdim]
        return (emb / max(np.linalg.norm(emb), 1e-6)).astype(np.float16)

    def clone_speaker(self, audio_16k: np.ndarray) -> Dict[str, list]:
        from wis_tpu.audio.mel import log_mel_spectrogram, pad_or_trim

        mel = log_mel_spectrogram(pad_or_trim(audio_16k))  # (80, 3000)
        program, cond_params = self._conditioning()
        cond = np.asarray(
            program(cond_params, jnp.asarray(mel[None], jnp.float32)),
            np.float16,
        )
        emb = self._speaker_embedding(audio_16k)
        return {
            "gpt_cond_latent": cond.tolist(),
            "speaker_embedding": emb.tolist(),
        }

    # ------------------------------------------------------------------ #
    def inference_stream(
        self,
        text: str,
        language: str,
        gpt_cond_latent: np.ndarray,  # (N_cond, D) or smaller (padded)
        speaker_embedding: np.ndarray,  # (cond_dim,)
        stream_chunk_size: int = 20,
        first_chunk_size: Optional[int] = None,
        overlap_wav_len: int = 1024,
        temperature: float = 0.1,
        length_penalty: float = 1.0,
        repetition_penalty: float = 7.0,
        top_k: int = 50,
        top_p: float = 0.8,
        do_sample: bool = True,
        speed: float = 1.0,
        decoder: str = "ne_hifigan",
        seed: int = 0,
        min_audio_tokens: int = 0,
    ) -> Iterator[np.ndarray]:
        """Yield float32 waveform chunks at 24 kHz (API surface:
        reference xtts/main.py:243-325).

        decoder ∈ {ne_hifigan, hifigan}: anything else coerces to
        ne_hifigan exactly like the reference (xtts/main.py:274). Both
        names resolve to the checkpoint's single HiFi-GAN here (Coqui
        model.pth ships one waveform decoder; the reference's split only
        selected legacy variants).

        first_chunk_size (default min(6, stream_chunk_size)): the FIRST
        dispatch decodes fewer tokens so audio starts flowing sooner —
        time-to-first-byte drops by ~(chunk−first)·per-token-ms while
        steady-state chunks keep the full stream_chunk_size (an
        extension over the reference, which holds TTFB until the full
        first chunk; the `chunk` sampling math is identical for any
        per-dispatch size)."""
        del length_penalty  # sampling (not beam) decode — kept for API compat
        if decoder not in ("ne_hifigan", "hifigan"):
            decoder = "ne_hifigan"
        vocoder_params = getattr(self, f"vocoder_params_{decoder}", None)
        if vocoder_params is None:
            vocoder_params = self.vocoder_params
        g = self.cfg.gpt
        tokens = self.tokenize(text, language)
        bucket = self._text_bucket(len(tokens))
        text_pad = np.zeros(bucket, np.int32)
        text_pad[: len(tokens)] = tokens

        cond = np.zeros((1, self.cfg.cond_len, g.d_model), np.float32)
        lat = np.asarray(gpt_cond_latent, np.float32).reshape(-1, g.d_model)
        cond[0, : min(self.cfg.cond_len, lat.shape[0])] = lat[: self.cfg.cond_len]
        speaker = np.asarray(speaker_embedding, np.float32).reshape(1, -1)

        prefill = self._program("prefill", text_len=bucket)
        fused = bool(self._fused and self.gpt_packed is not None)
        if fused:
            max_len = self.cfg.cond_len + bucket + 1 + g.max_audio_tokens
            full_t = ((max_len + 127) // 128) * 128
            prefix_len = self.cfg.cond_len + bucket + 1
            # cache-length buckets: start in the smallest slab that holds
            # the prefix + one chunk, grow on host-predicted boundaries
            t_buckets = [
                b for b in sorted(self.cfg.gpt_cache_buckets)
                if b % 128 == 0 and b < full_t
            ] + [full_t]

            def t_for(need: int) -> int:
                for b in t_buckets:
                    if need <= b:
                        return b
                return full_t

        _, cache = prefill(
            self.gpt_params, jnp.asarray(cond, self.dtype), jnp.asarray(text_pad[None])
        )
        t_ = jnp.float32(temperature)
        tk = jnp.int32(top_k)
        tp = jnp.float32(top_p)
        rp = jnp.float32(repetition_penalty)
        ds = jnp.bool_(do_sample)
        mt = jnp.int32(min_audio_tokens)
        speaker_dev = jnp.asarray(speaker, self.dtype)
        ctx0 = jnp.zeros(
            (1, self.cfg.left_context_frames, g.d_model), self.dtype
        )
        last0 = jnp.full((1,), g.start_audio_token, jnp.int32)
        history0 = jnp.zeros((1, g.max_audio_tokens), jnp.int32)
        key0 = jax.random.PRNGKey(seed)
        chunk = stream_chunk_size
        if first_chunk_size is None:
            first_chunk_size = min(6, chunk)
        first_chunk_size = max(1, min(first_chunk_size, chunk))
        # per-dispatch token counts: a short first chunk for TTFB, then
        # steady stream_chunk_size chunks, then one remainder chunk so a
        # cap-length generation emits EVERY token up to max_audio_tokens
        # (without it, first/chunk schedules that don't divide the cap
        # silently dropped the final <chunk tokens of a runaway
        # utterance; the remainder program only ever compiles for
        # cap-length generations)
        sizes = [first_chunk_size]
        while sum(sizes) + chunk <= g.max_audio_tokens:
            sizes.append(chunk)
        rem = g.max_audio_tokens - sum(sizes)
        if rem > 0:
            sizes.append(rem)
        max_chunks = len(sizes)

        if fused:
            t_cur = t_for(prefix_len + sizes[0])
            kc, vc = self._program("flatten", t_pad=t_cur)(cache)
            state = (ctx0, kc, vc, cache.pos, last0, history0, jnp.int32(0), key0)
        else:
            state = (ctx0, cache, last0, history0, jnp.int32(0), key0)
        launched = 0

        def launch(st):
            nonlocal launched, t_cur
            c_i = sizes[launched]
            launched += 1
            if fused:
                need = prefix_len + sum(sizes[:launched])
                ctx, kc, vc, pos, last, history, hist_len, key = st
                if need > t_cur:
                    t_new = t_for(need)
                    kc, vc = self._program("grow", t_from=t_cur, t_to=t_new)(
                        kc, vc
                    )
                    t_cur = t_new
                dec = self._program(
                    "decode_vocode_fused", chunk=c_i, t_pad=t_cur
                )
                return dec(
                    self.gpt_params, self.gpt_packed, self.gpt_head_packed,
                    vocoder_params, kc, vc, pos, ctx, last, history,
                    hist_len, speaker_dev, key, t_, tk, tp, rp, ds, mt,
                )
            ctx, cache, last, history, hist_len, key = st
            return self._program("decode_vocode", chunk=c_i)(
                self.gpt_params, vocoder_params, ctx, cache, last, history,
                hist_len, speaker_dev, key, t_, tk, tp, rp, ds, mt,
            )

        voc = self.cfg.vocoder
        left = self.cfg.left_context_frames
        # exact aggregate duration: token n's emission boundary in output
        # samples (floor, so per-chunk slices sum to the true length)
        target = lambda n: n * voc.gpt_code_stride * voc.sample_rate \
            // voc.input_sample_rate  # noqa: E731

        prev_wav_tail: Optional[np.ndarray] = None
        emitted = 0

        # Pipelined dispatch + OVERLAPPED fetches: up to `depth` chunks
        # are in flight; each result starts its device→host copy
        # asynchronously at dispatch time (copy_to_host_async), so the
        # ~27 ms tunnel round-trips overlap each other AND later chunks'
        # device compute WITHOUT fetch threads — on this single-core
        # host a thread pool measurably loses to async copies (GIL
        # contention between fetch threads and the dispatching main
        # thread: 21.7 vs 19 ms/chunk, and raising the pool depth made
        # it worse — 28.8 ms at depth 6). State still chains on device
        # in dispatch order; if chunk i says stop, the ≤depth
        # speculative dispatches are simply abandoned (a few ms of
        # wasted device time per utterance).
        import collections

        depth = max(1, int(os.environ.get("XTTS_PIPELINE_DEPTH", "3")))

        def _dispatch(st):
            disp, st = launch(st)
            try:
                disp.copy_to_host_async()
            except Exception:  # backend without async d2h: asarray blocks
                pass
            return disp, st

        inflight: "collections.deque" = collections.deque()
        dispatched = 0
        try:
            while dispatched < min(depth, max_chunks):
                disp, state = _dispatch(state)
                inflight.append(disp)
                dispatched += 1
            for i in range(max_chunks):
                c_i = sizes[i]
                arr = np.asarray(inflight.popleft())
                valid = int(arr[-2])
                done = bool(arr[-1])
                if not done and valid == c_i and dispatched < max_chunks:
                    disp, state = _dispatch(state)
                    inflight.append(disp)
                    dispatched += 1

                if valid > 0:
                    full = arr[:-2]
                    # the chunk's local wav covers (left + c_i) tokens and
                    # ends exactly at token boundary emitted+c_i; emit the
                    # `want` samples ending at the first `valid` new
                    # tokens' boundary (sub-sample boundary jitter from
                    # the two floor-interpolations is absorbed by the
                    # crossfade)
                    want = target(emitted + valid) - target(emitted)
                    end = round(len(full) * (left + valid) / (left + c_i))
                    wav = full[max(0, end - want): end].copy()

                    # crossfade with the previous chunk tail
                    if prev_wav_tail is not None and overlap_wav_len > 0:
                        n = min(len(prev_wav_tail), overlap_wav_len, len(wav))
                        if n > 0:
                            ramp = np.linspace(0.0, 1.0, n, dtype=np.float32)
                            wav[:n] = wav[:n] * ramp + prev_wav_tail[:n] * (
                                1 - ramp
                            )
                    if overlap_wav_len > 0 and len(wav) > overlap_wav_len:
                        prev_wav_tail = wav[-overlap_wav_len:].copy()
                    emit = wav
                    if speed != 1.0 and speed > 0:
                        from wis_tpu.audio import codecs

                        emit = codecs.resample(
                            emit,
                            int(self.cfg.vocoder.sample_rate * speed),
                            self.cfg.vocoder.sample_rate,
                        )
                    emitted += valid
                    yield emit.astype(np.float32)

                if done or valid < c_i:
                    break
        finally:
            # drop abandoned speculative results so their buffers free
            inflight.clear()

    def inference_stream_split(
        self, text: str, language: str, *args, enable_text_splitting: bool = False,
        **kwargs
    ) -> Iterator[np.ndarray]:
        """Like inference_stream, optionally splitting long text into
        sentences synthesized sequentially (the reference's
        enable_text_splitting surface, xtts/main.py:243-325)."""
        pieces = split_sentences(text) if enable_text_splitting else [text]
        for piece in pieces:
            if piece.strip():
                yield from self.inference_stream(piece, language, *args, **kwargs)

    def synthesize(self, *args, **kwargs) -> np.ndarray:
        """Non-streaming convenience: concatenate all chunks."""
        chunks = list(self.inference_stream(*args, **kwargs))
        if not chunks:
            return np.zeros(0, np.float32)
        return np.concatenate(chunks)


def split_sentences(text: str) -> list:
    """Naive sentence segmentation for enable_text_splitting."""
    import re

    parts = re.split(r"(?<=[.!?。！？])\s+", text.strip())
    return [p for p in parts if p]
