"""Orbax checkpoint round-trip for converted parameter trees."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wis_tpu.models.whisper.checkpoint import load_params, save_params
from wis_tpu.models.whisper.config import WhisperConfig
from wis_tpu.models.whisper.weights import random_params

CFG = WhisperConfig(
    name="micro-ckpt",
    n_audio_state=32,
    n_audio_head=2,
    n_audio_layer=1,
    n_text_state=32,
    n_text_head=2,
    n_text_layer=1,
    n_vocab=128,
    n_audio_ctx=8,
    n_text_ctx=8,
)


def test_checkpoint_roundtrip(tmp_path):
    params = random_params(CFG, seed=0, dtype=jnp.float32)
    path = str(tmp_path / "ckpt")
    assert save_params(params, path)
    restored = load_params(path)
    assert restored is not None
    assert jax.tree.structure(restored) == jax.tree.structure(params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_missing_returns_none(tmp_path):
    assert load_params(str(tmp_path / "nope")) is None
