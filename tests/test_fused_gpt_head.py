"""Fused GPT sampling-head kernel (ops/fused_gpt_head.py) vs the XLA
epilogue it replaces: identical tokens and masked-logit sets through
double-LN → head → stop-floor → penalty → temperature → top-k → top-p →
categorical/greedy, on the micro config (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wis_tpu.models.xtts.gpt import GPTConfig, _ln, _mask_logits, random_gpt
from wis_tpu.ops.fused_gpt_head import build_fused_gpt_head, pack_head, v_padded

CFG = GPTConfig(
    n_layer=2,
    n_head=2,
    d_model=128,
    n_text_vocab=256,
    n_audio_vocab=68,
    max_text_tokens=32,
    max_audio_tokens=40,
    start_audio_token=66,
    stop_audio_token=67,
)


def _xla_epilogue(params, x, hist_tokens, key, temp, tk, tp, rp, ds, stop_blocked, dtype):
    """The exact ops run_decode_chunk_fused used before the head kernel."""
    h1 = _ln(x.astype(dtype), params["gpt_lnf_g"], params["gpt_lnf_b"])
    hidden = _ln(h1, params["lnf_g"], params["lnf_b"])
    logits = (hidden @ params["head_w"].astype(dtype) + params["head_b"].astype(dtype)).astype(
        jnp.float32
    )
    v = logits.shape[-1]
    logits = jnp.where(
        (jnp.arange(v) == CFG.stop_audio_token)[None] & stop_blocked, -1e30, logits
    )
    masked = _mask_logits(
        logits, hist_tokens, jnp.float32(temp), jnp.int32(tk),
        jnp.float32(tp), jnp.float32(rp),
    )
    sampled = jax.random.categorical(key, masked, axis=-1)
    greedy = jnp.argmax(masked, axis=-1)
    tok = jnp.where(jnp.bool_(ds), sampled, greedy).astype(jnp.int32)
    return tok, hidden, masked


def _kernel_epilogue(params, x, hist_tokens, key, temp, tk, tp, rp, ds, stop_blocked, dtype):
    vp = v_padded(CFG.n_audio_vocab)
    head = build_fused_gpt_head(CFG, dtype=dtype)
    ln4, head_w, head_b = pack_head(params, CFG, dtype)
    hist = (
        jax.nn.one_hot(hist_tokens, vp, dtype=jnp.float32).sum(axis=1) > 0
    ).astype(jnp.float32)
    gum = jnp.pad(
        jax.random.gumbel(key, (1, CFG.n_audio_vocab), jnp.float32),
        ((0, 0), (0, vp - CFG.n_audio_vocab)),
    )
    knobs = jnp.array(
        [[temp, float(tk), tp, rp, float(stop_blocked), float(ds), 0.0, 0.0]],
        jnp.float32,
    )
    tok, hidden, logits = head(
        x.astype(jnp.float32), ln4, head_w, head_b, hist, gum, knobs
    )
    return tok, hidden, logits


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize(
    "temp,tk,tp,rp,ds,stop_blocked",
    [
        (0.7, 12, 0.8, 7.0, True, False),
        (0.1, 50, 0.85, 7.0, True, True),
        (1.0, 2, 0.5, 1.0, False, False),
        (0.75, 1000, 1.0, 2.0, True, False),
    ],
)
def test_head_kernel_matches_xla_epilogue(seed, temp, tk, tp, rp, ds, stop_blocked):
    dtype = jnp.float32
    params = random_gpt(CFG, seed=seed, dtype=dtype)
    rng = np.random.default_rng(seed + 10)
    x = jnp.asarray(rng.standard_normal((1, CFG.d_model)), jnp.float32)
    hist_tokens = jnp.asarray(
        rng.integers(0, CFG.n_audio_vocab, size=(1, 9)), jnp.int32
    )
    key = jax.random.PRNGKey(seed)

    tok_x, hid_x, masked_x = _xla_epilogue(
        params, x, hist_tokens, key, temp, tk, tp, rp, ds, stop_blocked, dtype
    )
    tok_k, hid_k, masked_k = _kernel_epilogue(
        params, x, hist_tokens, key, temp, tk, tp, rp, ds, stop_blocked, dtype
    )

    v = CFG.n_audio_vocab
    kept_x = np.asarray(masked_x[0]) > -1e29
    kept_k = np.asarray(masked_k[0, :v]) > -1e29
    np.testing.assert_array_equal(kept_k, kept_x)
    np.testing.assert_allclose(
        np.asarray(masked_k[0, :v])[kept_k],
        np.asarray(masked_x[0])[kept_x],
        rtol=1e-5,
    )
    assert not (np.asarray(masked_k[0, v:]) > -1e29).any(), "pad lanes leaked"
    np.testing.assert_allclose(
        np.asarray(hid_k), np.asarray(hid_x, np.float32), rtol=1e-5, atol=1e-6
    )
    assert int(tok_k[0, 0]) == int(tok_x[0])


def test_head_kernel_tie_order_matches_sort():
    """Exact duplicate logits (the bf16→f32 path produces plenty) must
    resolve through the same reversed-stable-sort tie order _mask_logits
    gets from jnp.sort."""
    dtype = jnp.float32
    params = random_gpt(CFG, seed=3, dtype=dtype)
    # force heavy ties: quantize the head weights hard
    params["head_w"] = jnp.round(params["head_w"] * 4) / 4 * 0 + jnp.tile(
        jnp.asarray(
            np.random.default_rng(0).standard_normal((CFG.d_model, 1)), dtype
        ),
        (1, CFG.n_audio_vocab),
    )  # every column identical → all logits tie
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, CFG.d_model)), jnp.float32
    )
    hist = jnp.zeros((1, 4), jnp.int32)
    key = jax.random.PRNGKey(0)
    args = (0.7, 10, 0.6, 1.0, False, False)
    tok_x, _, masked_x = _xla_epilogue(params, x, hist, key, *args, dtype)
    tok_k, _, masked_k = _kernel_epilogue(params, x, hist, key, *args, dtype)
    v = CFG.n_audio_vocab
    np.testing.assert_array_equal(
        np.asarray(masked_k[0, :v]) > -1e29, np.asarray(masked_x[0]) > -1e29
    )
    assert int(tok_k[0, 0]) == int(tok_x[0])


def test_head_opt_in_stream_matches_default(monkeypatch):
    """XTTS_FUSED_HEAD=1 (opt-in kernel epilogue) must produce the same
    audio stream as the default XLA epilogue — keeps the measured
    alternative from rotting while it stays off by default
    (probe_fused_gpt_floor: XLA epilogue 0.05 ms/tok vs kernel 0.14)."""
    import jax.numpy as jnp

    from wis_tpu.models.xtts.hifigan import HiFiGANConfig
    from wis_tpu.models.xtts.model import XTTSConfig, XTTSModel

    micro = XTTSConfig(
        gpt=GPTConfig(
            n_layer=2, n_head=2, d_model=32, n_text_vocab=256,
            n_audio_vocab=68, max_text_tokens=32, max_audio_tokens=40,
            start_audio_token=66, stop_audio_token=67,
        ),
        vocoder=HiFiGANConfig(
            in_dim=32, cond_dim=16, upsample_initial=32,
            upsample_rates=(4, 2), upsample_kernels=(8, 4),
            resblock_kernels=(3,), resblock_dilations=((1, 3),),
            gpt_code_stride=16,
        ),
        text_buckets=(8, 16, 32),
        cond_len=4,
        left_context_frames=2,
    )
    rng = np.random.default_rng(7)
    latent = rng.standard_normal((4, 32)).astype(np.float32) * 0.1
    speaker = rng.standard_normal(16).astype(np.float32)
    kwargs = dict(
        stream_chunk_size=8, overlap_wav_len=16, do_sample=True, seed=3,
        min_audio_tokens=16,
    )
    monkeypatch.setenv("XTTS_FUSED", "1")
    monkeypatch.setenv("XTTS_FUSED_HEAD", "0")
    base = list(
        XTTSModel(cfg=micro, dtype=jnp.float32).inference_stream(
            "hello head", "en", latent, speaker, **kwargs
        )
    )
    monkeypatch.setenv("XTTS_FUSED_HEAD", "1")
    headed = list(
        XTTSModel(cfg=micro, dtype=jnp.float32).inference_stream(
            "hello head", "en", latent, speaker, **kwargs
        )
    )
    assert len(base) == len(headed) > 0
    for a, b in zip(base, headed):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=5e-2, atol=5e-2)
