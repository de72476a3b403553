"""Language detection.

Replaces `whisper_model.detect_language(gpu_features)` (reference
main.py:633-644, backed by CTranslate2 C++): encoder forward + one decoder
step from `<|startoftranscript|>`, with the distribution restricted to the
99 language tokens. One compiled program per model.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from wis_tpu.models.whisper.config import WhisperConfig
from wis_tpu.models.whisper.model import DecoderCache, cross_kv, encode, prefill
from wis_tpu.models.whisper.tokenizer import (
    LANG_BASE,
    LANG_TOKEN,
    SOT,
    _LANG_CODES_V3,
    layout_for_vocab,
)

N_LANG = len(LANG_TOKEN)  # v2 layout (99); per-model count comes from cfg


def build_detect_language_xa(cfg: WhisperConfig):
    """Jitted detect over precomputed encoder K/V: (params, xa_kv) →
    (lang_index (B,), prob (B,)) for every window in the batch. The
    engine's chunked path reads index 0 (the reference detects on chunk 0
    only, main.py:633-644); the dynamic batcher uses all rows — one
    detect dispatch covers a whole coalesced batch."""

    @jax.jit
    def detect(params, xa_kv):
        return _detect_from_kv(params, xa_kv, cfg)

    return detect


def _detect_from_kv(params, xa_kv, cfg):
    b = xa_kv[0].shape[1]
    dtype = params["decoder"]["tok_emb"].dtype
    cache = DecoderCache.zeros(cfg, b, 1, dtype)
    sot = jnp.full((b, 1), SOT, jnp.int32)
    logits, _ = prefill(params, sot, cache, xa_kv, cfg)
    n_lang = layout_for_vocab(cfg.n_vocab).n_langs
    lang_logits = jax.lax.dynamic_slice_in_dim(
        logits[:, -1], LANG_BASE, n_lang, axis=-1
    )
    probs = jax.nn.softmax(lang_logits, axis=-1)
    idx = jnp.argmax(probs, axis=-1)
    return idx.astype(jnp.int32), jnp.take_along_axis(probs, idx[:, None], axis=-1)[
        :, 0
    ]


def build_detect_language(cfg: WhisperConfig):
    """Return jitted detect(params, mel) → (lang_index (B,), prob (B,))."""

    @jax.jit
    def detect(params, mel):
        b = mel.shape[0]
        dtype = params["decoder"]["tok_emb"].dtype
        xa = encode(params, mel, cfg)
        xa_kv = cross_kv(params, xa, cfg)
        cache = DecoderCache.zeros(cfg, b, 1, dtype)
        sot = jnp.full((b, 1), SOT, jnp.int32)
        logits, _ = prefill(params, sot, cache, xa_kv, cfg)
        lang_logits = jax.lax.dynamic_slice_in_dim(
            logits[:, -1], LANG_BASE, layout_for_vocab(cfg.n_vocab).n_langs, axis=-1
        )
        probs = jax.nn.softmax(lang_logits, axis=-1)
        idx = jnp.argmax(probs, axis=-1)
        return idx.astype(jnp.int32), jnp.take_along_axis(
            probs, idx[:, None], axis=-1
        )[:, 0]

    return detect


def lang_index_to_code(idx: int) -> str:
    # index 99 (<|yue|>) only arises from v3-layout models
    return _LANG_CODES_V3[int(idx)]
