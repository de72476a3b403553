"""Residency planning tests: multi-model co-residency, HBM budget
enforcement, eviction (replaces the reference's VRAM probing,
main.py:234-302)."""

import jax.numpy as jnp
import pytest

from wis_tpu.models.whisper.config import WHISPER_CONFIGS
from wis_tpu.runtime.residency import ModelRegistry
from wis_tpu.settings import APISettings


def test_multi_model_coresidency():
    reg = ModelRegistry(APISettings(quant="none"))
    tiny = reg.get("tiny")
    base = reg.get("base")
    assert set(reg.loaded()) == {"tiny", "base"}
    assert reg.resident_bytes() == tiny.param_bytes + base.param_bytes
    # same object on repeat get (lazy singleton, reference main.py:319-448)
    assert reg.get("tiny") is tiny


def test_all_sizes_fit_single_chip_budget():
    """bf16 tiny..large-v2 must co-reside within a v5e (BASELINE.md)."""
    total = sum(
        WHISPER_CONFIGS[s].hbm_bytes(2)
        for s in ("tiny", "base", "small", "medium", "large")
    )
    assert total < 12 * 1024**3  # leaves ≥4 GiB headroom of 16


def test_budget_enforced():
    settings = APISettings(hbm_budget_bytes=5 * 1024**3, quant="none")
    reg = ModelRegistry(settings)
    with pytest.raises(MemoryError):
        reg.get("large")  # ~3 GB params + 4 GB headroom > 5 GB budget


def test_eviction():
    reg = ModelRegistry(APISettings(quant="none"))
    reg.get("tiny")
    assert reg.evict("tiny")
    assert not reg.evict("tiny")
    assert reg.resident_bytes() == 0


def test_quantized_registry_smaller():
    """int8 halves the decoder matmul weights. The quantized tree also
    carries a deliberate extra leaf — the per-row int8 tok_emb copy for
    the logits matmul (ops/quant.py) — so the comparison nets it out:
    on tiny the (V, D) copy outweighs the matmul savings, on large it
    is ~5× smaller than them."""
    bf16 = ModelRegistry(APISettings(quant="none")).get("tiny")
    q = ModelRegistry(APISettings(quant="int8")).get("tiny")
    eq = q.params["decoder"]["tok_emb_q"]
    emb_copy = eq["q"].size + eq["s"].size * 4
    assert q.param_bytes - emb_copy < bf16.param_bytes


def test_large_alias():
    reg = ModelRegistry(APISettings(quant="none"))
    m = reg.get("large-v2")
    assert m.name == "large"
