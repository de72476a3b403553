"""HBM-aware multi-model residency.

The reference holds lazy per-size CTranslate2 handles and gates features on
runtime VRAM probes (reference main.py:319-477, 234-302). On TPU the HBM
envelope is static per chip type, so residency is *planned*: each model's
parameter footprint is known from its config, loads are lazy by default
(same `LazyModels` semantics) or eager via the preload flags, and the
registry refuses loads that would blow the configured HBM budget instead
of discovering OOM at runtime.

All five sizes in bf16 total ≈ 8 GB — they co-reside on one 16 GiB v5e
chip with headroom for KV caches and activations (BASELINE.md envelope).
"""

from __future__ import annotations

import logging
import os
import threading
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from wis_tpu.models.whisper.config import (
    WHISPER_CONFIGS,
    WhisperConfig,
    resolve_model_name,
)
from wis_tpu.models.whisper.tokenizer import WhisperTokenizer, layout_for_vocab
from wis_tpu.models.whisper.weights import load_or_init_params
from wis_tpu.settings import APISettings, get_api_settings

logger = logging.getLogger("wis_tpu")

#: activation + KV-cache headroom reserved out of the HBM budget
_HEADROOM_BYTES = 4 * 1024**3


@dataclass
class LoadedModel:
    name: str
    cfg: WhisperConfig
    params: Dict
    tokenizer: WhisperTokenizer
    param_bytes: int
    #: kernel-layout decoder weights for the fused decode step
    #: (ops/fused_decode.pack_decoder) — filled lazily by the engine
    packed: object = None
    #: checkpoint directory (None when seeded-random); lets the engine
    #: pick up optional per-checkpoint assets (alignment_heads.json)
    model_dir: Optional[str] = None


class ModelRegistry:
    """Lazy, thread-safe model store (the `LazyModels` analog,
    reference main.py:319-448)."""

    def __init__(
        self,
        settings: Optional[APISettings] = None,
        dtype=None,
        device=None,
    ):
        self.settings = settings or get_api_settings()
        self.dtype = dtype or getattr(jnp, self.settings.dtype)
        #: pin parameters to a specific chip (replica pool, the
        #: `device_index` analog) — None uses the default device
        self.device = device
        self._models: Dict[str, LoadedModel] = {}
        self._lock = threading.Lock()
        self._tokenizer: Optional[WhisperTokenizer] = None

    # ------------------------------------------------------------------ #
    def tokenizer(self) -> WhisperTokenizer:
        """Shared tokenizer across sizes (the reference loads one
        WhisperProcessor from the base model dir, main.py:328-334)."""
        if self._tokenizer is None:
            for size in ("base", "tiny", "small", "medium", "large"):
                d = self._model_dir(size)
                if d and os.path.isdir(d):
                    self._tokenizer = WhisperTokenizer.from_dir(d)
                    break
            else:
                self._tokenizer = WhisperTokenizer()
        return self._tokenizer

    def _model_dir(self, size: str) -> Optional[str]:
        root = self.settings.model_dir
        for candidate in (
            os.path.join(root, size),
            os.path.join(root, f"whisper-{size}"),
            os.path.join(root, f"tovera-wis-whisper-{size}"),
        ):
            if os.path.isdir(candidate):
                return candidate
        return None

    # ------------------------------------------------------------------ #
    def resident_bytes(self) -> int:
        return sum(m.param_bytes for m in self._models.values())

    def would_fit(self, cfg: WhisperConfig) -> bool:
        need = cfg.hbm_bytes(2 if self.dtype == jnp.bfloat16 else 4)
        return (
            self.resident_bytes() + need + _HEADROOM_BYTES
            <= self.settings.hbm_budget_bytes
        )

    def get(self, name: str) -> LoadedModel:
        size = resolve_model_name(name)
        with self._lock:
            if size in self._models:
                return self._models[size]
            cfg = WHISPER_CONFIGS[size]
            if not self.would_fit(cfg):
                raise MemoryError(
                    f"Loading whisper-{size} would exceed the HBM budget "
                    f"({self.resident_bytes()/2**30:.1f} GiB resident, "
                    f"budget {self.settings.hbm_budget_bytes/2**30:.1f} GiB)"
                )
            logger.info("REGISTRY: loading whisper model %s", size)
            params = load_or_init_params(
                cfg, self._model_dir(size), seed=hash(size) % 2**31, dtype=self.dtype
            )
            if self.settings.quant in ("int8", "int4"):
                # "int4" aliases int8 since round 3 (the int4 decode
                # stream measured perf-neutral and was removed —
                # settings.py / BENCH.md §int4)
                from wis_tpu.ops.quant import quantize_whisper_params

                params = quantize_whisper_params(params)
            if self.device is not None:
                params = jax.device_put(params, self.device)
            param_bytes = sum(
                a.size * a.dtype.itemsize for a in jax.tree.leaves(params)
            )
            lay = layout_for_vocab(cfg.n_vocab)
            tok = self.tokenizer()
            if tok.layout is not lay:
                # v3-layout models carry their own tokenizer (the vocab
                # adds <|yue|> and shifts the task/timestamp specials)
                d = self._model_dir(size)
                tok = (
                    WhisperTokenizer.from_dir(d, layout=lay)
                    if d
                    else WhisperTokenizer(layout=lay)
                )
            model = LoadedModel(
                size, cfg, params, tok, param_bytes,
                model_dir=self._model_dir(size),
            )
            self._models[size] = model
            return model

    def loaded(self) -> Dict[str, LoadedModel]:
        return dict(self._models)

    def evict(self, name: str) -> bool:
        """Drop a model's params from HBM (no reference analog — CT2 holds
        models forever; useful under memory pressure)."""
        size = resolve_model_name(name)
        with self._lock:
            return self._models.pop(size, None) is not None

    def preload(self) -> None:
        """Eager loads per the preload flags (reference main.py:451-477)."""
        s = self.settings
        wanted = []
        flags = {
            "tiny": s.preload_whisper_model_tiny,
            "base": s.preload_whisper_model_base,
            "small": s.preload_whisper_model_small,
            "medium": s.preload_whisper_model_medium,
            "large": s.preload_whisper_model_large,
        }
        for size, flag in flags.items():
            if s.preload_all_models or flag:
                wanted.append(size)
        for size in wanted:
            try:
                self.get(size)
            except MemoryError as e:
                logger.warning("REGISTRY: skipping preload of %s: %s", size, e)
