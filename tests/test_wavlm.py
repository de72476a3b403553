"""WavLM x-vector parity vs randomly-initialized HF torch model, plus the
SpeakerVerifier service built on it (reference do_sv, main.py:797-879)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from wis_tpu.models.wavlm.model import (
    WavLMConfig,
    params_from_hf_wavlm,
    random_wavlm,
    xvector_embed,
)
from wis_tpu.server.sv import SpeakerVerifier, cosine, sox_norm_trim
from wis_tpu.settings import APISettings

MICRO = WavLMConfig(
    hidden_size=32,
    num_layers=2,
    num_heads=2,
    intermediate_size=64,
    conv_dim=(16,) * 7,
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
    num_buckets=40,
    max_bucket_distance=100,
    tdnn_dim=(24, 24, 24, 24, 48),
    xvector_output_dim=24,
)


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import WavLMConfig as HFConfig
    from transformers import WavLMForXVector

    hf_cfg = HFConfig(
        hidden_size=MICRO.hidden_size,
        num_hidden_layers=MICRO.num_layers,
        num_attention_heads=MICRO.num_heads,
        intermediate_size=MICRO.intermediate_size,
        conv_dim=list(MICRO.conv_dim),
        conv_kernel=list(MICRO.conv_kernel),
        conv_stride=list(MICRO.conv_stride),
        conv_bias=MICRO.conv_bias,
        num_conv_pos_embeddings=MICRO.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=MICRO.num_conv_pos_embedding_groups,
        num_buckets=MICRO.num_buckets,
        max_bucket_distance=MICRO.max_bucket_distance,
        tdnn_dim=list(MICRO.tdnn_dim),
        tdnn_kernel=list(MICRO.tdnn_kernel),
        tdnn_dilation=list(MICRO.tdnn_dilation),
        xvector_output_dim=MICRO.xvector_output_dim,
        do_stable_layer_norm=False,
        feat_extract_norm="group",
        apply_spec_augment=False,
        layerdrop=0.0,
    )
    torch.manual_seed(0)
    model = WavLMForXVector(hf_cfg)
    model.eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = params_from_hf_wavlm(sd, MICRO, dtype=jnp.float32)
    return model, params


def test_xvector_parity(hf_pair):
    model, params = hf_pair
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((1, 16000)).astype(np.float32) * 0.1
    with torch.no_grad():
        expected = model(input_values=torch.from_numpy(audio)).embeddings.numpy()
    got = np.asarray(xvector_embed(params, jnp.asarray(audio), MICRO))
    assert got.shape == expected.shape == (1, MICRO.xvector_output_dim)
    np.testing.assert_allclose(got, expected, atol=5e-3, rtol=1e-2)


def test_embedding_is_speaker_discriminative_shapewise():
    params = random_wavlm(MICRO, seed=1)
    rng = np.random.default_rng(1)
    a = rng.standard_normal((1, 8000)).astype(np.float32) * 0.1
    e1 = np.asarray(xvector_embed(params, jnp.asarray(a), MICRO))
    e2 = np.asarray(xvector_embed(params, jnp.asarray(a), MICRO))
    np.testing.assert_allclose(e1, e2)  # deterministic


def test_sox_norm_trim():
    audio = np.ones(20 * 16000, np.float32) * 0.5
    out = sox_norm_trim(audio)
    assert out.shape[0] == 10 * 16000
    np.testing.assert_allclose(np.abs(out).max(), 10 ** (-8 / 20), atol=1e-5)


def test_cosine():
    a = np.asarray([1.0, 0.0])
    assert cosine(a, a) == pytest.approx(1.0)
    assert cosine(a, np.asarray([0.0, 1.0])) == pytest.approx(0.0)
    assert cosine(a, np.zeros(2)) == 0.0


def test_speaker_verifier_enroll_and_verify(tmp_path):
    settings = APISettings(support_sv=True, sv_speaker_dir=str(tmp_path))
    params = random_wavlm(MICRO, seed=2)

    def embed(audio):
        return np.asarray(xvector_embed(params, jnp.asarray(audio[None]), MICRO))[0]

    verifier = SpeakerVerifier(settings, embed_fn=embed)
    rng = np.random.default_rng(3)
    voice = rng.standard_normal(16000).astype(np.float32) * 0.1
    verifier.enroll("alice", voice)
    assert (tmp_path / "alice.npy").exists()
    # identical audio matches with score ~1
    hits = verifier.verify(voice)
    assert "alice" in hits and hits["alice"] > 0.99
