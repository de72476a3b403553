"""Numerical parity vs HuggingFace torch models (randomly initialized).

No pretrained weights are downloadable in this environment, but the
`transformers` *modeling code* is local — so we instantiate HF models
with random weights from a config, convert the state_dict through our
weight converter, and require our JAX forward pass to match torch. This
validates both the converter (wis_tpu/models/whisper/weights.py) and the
model math end-to-end: with a real checkpoint dropped into models/, the
same code path produces CTranslate2-matching transcripts (reference
BASELINE.json config #1).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from wis_tpu.models.whisper.config import WhisperConfig
from wis_tpu.models.whisper.model import (
    DecoderCache,
    cross_kv,
    encode,
    prefill,
)
from wis_tpu.models.whisper.tokenizer import SOT
from wis_tpu.models.whisper.weights import params_from_hf

CFG = WhisperConfig(
    name="hf-micro",
    n_audio_state=64,
    n_audio_head=2,
    n_audio_layer=2,
    n_text_state=64,
    n_text_head=2,
    n_text_layer=2,
)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    hf_cfg = HFConfig(
        vocab_size=CFG.n_vocab,
        num_mel_bins=CFG.n_mels,
        d_model=CFG.n_audio_state,
        encoder_layers=CFG.n_audio_layer,
        encoder_attention_heads=CFG.n_audio_head,
        decoder_layers=CFG.n_text_layer,
        decoder_attention_heads=CFG.n_text_head,
        encoder_ffn_dim=4 * CFG.n_audio_state,
        decoder_ffn_dim=4 * CFG.n_text_state,
        max_source_positions=CFG.n_audio_ctx,
        max_target_positions=CFG.n_text_ctx,
    )
    torch.manual_seed(0)
    model = WhisperForConditionalGeneration(hf_cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def jax_params(hf_model):
    tensors = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    return params_from_hf(tensors, CFG, dtype=jnp.float32)


def test_encoder_parity(hf_model, jax_params):
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 80, 3000)).astype(np.float32)
    with torch.no_grad():
        expected = (
            hf_model.model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
        )
    got = np.asarray(encode(jax_params, jnp.asarray(mel), CFG))
    assert got.shape == expected.shape == (2, 1500, 64)
    np.testing.assert_allclose(got, expected, atol=2e-3, rtol=1e-3)


def test_decoder_logits_parity(hf_model, jax_params):
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 80, 3000)).astype(np.float32)
    tokens = np.asarray([[SOT, 100, 2000, 31337]], dtype=np.int64)
    with torch.no_grad():
        expected = (
            hf_model(
                input_features=torch.from_numpy(mel),
                decoder_input_ids=torch.from_numpy(tokens),
            )
            .logits.numpy()
        )
    xa = encode(jax_params, jnp.asarray(mel), CFG)
    xa_kv = cross_kv(jax_params, xa, CFG)
    cache = DecoderCache.zeros(CFG, 1, 8, jnp.float32)
    logits, _ = prefill(
        jax_params, jnp.asarray(tokens, jnp.int32), cache, xa_kv, CFG
    )
    got = np.asarray(logits)
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=3e-3, rtol=1e-3)
