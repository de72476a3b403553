"""int8 weight-only quantization tests: accuracy, kernel parity, and the
quantized whisper forward (the CT2 int8_float16 analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wis_tpu.models.whisper.config import WhisperConfig
from wis_tpu.models.whisper.model import encode
from wis_tpu.models.whisper.weights import random_params
from wis_tpu.ops.quant import (
    dequantize,
    is_quantized,
    qmatmul,
    quantize_weight,
    quantize_whisper_params,
)

CFG = WhisperConfig(
    name="micro-q",
    n_audio_state=64,
    n_audio_head=2,
    n_audio_layer=2,
    n_text_state=64,
    n_text_head=2,
    n_text_layer=2,
)


def test_quantize_roundtrip_accuracy():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((128, 256)).astype(np.float32) * 0.05)
    q = quantize_weight(w)
    assert q["q"].dtype == jnp.int8
    assert q["s"].shape == (1, 256)
    deq = np.asarray(dequantize(q, jnp.float32))
    # per-channel int8: worst-case error is scale/2 per element
    scales = np.asarray(q["s"])[0]
    err = np.abs(deq - np.asarray(w))
    assert (err <= scales / 2 + 1e-6).all()


def test_qmatmul_matches_dequant_reference():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((128, 256)).astype(np.float32) * 0.1)
    q = quantize_weight(w)
    got = np.asarray(qmatmul(x, q))
    ref = np.asarray(x @ dequantize(q, jnp.float32))
    np.testing.assert_allclose(got, ref, atol=5e-2, rtol=5e-2)
    # and close to the unquantized result
    exact = np.asarray(x @ w)
    rel = np.abs(got - exact).max() / (np.abs(exact).max() + 1e-9)
    assert rel < 0.05


def test_pallas_kernel_interpret_matches_xla():
    from wis_tpu.ops.quant_pallas import int8_matmul

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((5, 256)).astype(np.float32), jnp.float32)
    w = jnp.asarray(rng.standard_normal((256, 384)).astype(np.float32) * 0.1)
    q = quantize_weight(w)
    from jax.experimental import pallas as pl  # noqa: F401
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(int8_matmul(x, q["q"], q["s"], block_n=128, block_k=128))
    ref = np.asarray(qmatmul(x, q))
    np.testing.assert_allclose(got, ref, atol=1e-1, rtol=5e-2)


def test_quantize_whisper_params_structure():
    params = random_params(CFG, seed=0, dtype=jnp.float32)
    qp = quantize_whisper_params(params)
    blk = qp["decoder"]["blocks"]["attn"]
    assert is_quantized(blk["q_w"])
    assert blk["q_w"]["q"].shape == (2, 64, 64)
    assert blk["q_w"]["s"].shape == (2, 1, 64)
    # non-eligible leaves untouched; encoder stays bf16 by default
    # (compute-bound — dequant only adds work there)
    assert not is_quantized(qp["decoder"]["tok_emb"])
    assert not is_quantized(qp["encoder"]["blocks"]["attn"]["q_w"])
    both = quantize_whisper_params(params, subtrees=("encoder", "decoder"))
    assert is_quantized(both["encoder"]["blocks"]["attn"]["q_w"])


def test_quantized_encoder_forward_close():
    params = random_params(CFG, seed=3, dtype=jnp.float32)
    qp = quantize_whisper_params(params, subtrees=("encoder", "decoder"))
    rng = np.random.default_rng(4)
    mel = jnp.asarray(rng.standard_normal((1, 80, 3000)), jnp.float32)
    ref = np.asarray(encode(params, mel, CFG))
    got = np.asarray(encode(qp, mel, CFG))
    # weight-only int8 keeps activations close (relative to spread)
    denom = np.abs(ref).max()
    assert np.abs(got - ref).max() / denom < 0.1
    # cosine similarity essentially 1
    cos = (ref * got).sum() / (np.linalg.norm(ref) * np.linalg.norm(got))
    assert cos > 0.999
