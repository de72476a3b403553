"""External oracle for the XTTS GPT decoder.

Coqui's XTTS GPT IS a Hugging Face GPT2Model driven via inputs_embeds
(custom text/audio embeddings added outside; the internal wpe is nulled
— TTS/tts/layers/xtts/gpt.py builds it through
build_hf_gpt_transformer). transformers is available offline, so the
block-stack math (models/xtts/gpt.py gpt_pass) can be validated against
the exact implementation the real checkpoint was trained under —
full-prefix AND KV-cached incremental decode — and the on-device
sampling pipeline against HF's logits processors, which is what Coqui's
`model.generate(...)` applies (reference xtts/main.py:243-325 exposes
those knobs verbatim).
"""

import numpy as np
import pytest
import torch

from wis_tpu.models.xtts.convert import gpt_from_coqui
from wis_tpu.models.xtts.gpt import GPTCache, GPTConfig, gpt_pass

from test_xtts_convert import GPT as MICRO_GPT, _gpt_sd

D = MICRO_GPT.d_model


def _torch_gpt2(sd):
    """HF GPT2Model loaded from the Coqui-layout state dict, with the
    internal position embedding nulled the way Coqui's
    build_hf_gpt_transformer does (positional information arrives inside
    inputs_embeds)."""
    from transformers import GPT2Config, GPT2Model

    cfg = GPT2Config(
        vocab_size=8,  # unused: driven via inputs_embeds
        n_positions=64,
        n_embd=MICRO_GPT.d_model,
        n_layer=MICRO_GPT.n_layer,
        n_head=MICRO_GPT.n_head,
        activation_function="gelu_new",  # == jax.nn.gelu(approximate=True)
        resid_pdrop=0.0,
        embd_pdrop=0.0,
        attn_pdrop=0.0,
    )
    model = GPT2Model(cfg)
    state = {
        k[len("gpt.gpt."):]: torch.from_numpy(np.asarray(v))
        for k, v in sd.items()
        if k.startswith("gpt.gpt.")
    }
    missing, unexpected = model.load_state_dict(state, strict=False)
    # only the embeddings we null/bypass may be missing
    assert all(m.startswith(("wte", "wpe")) for m in missing), missing
    assert unexpected == [], unexpected
    with torch.no_grad():
        model.wpe.weight.zero_()
    model.eval()
    return model


@pytest.fixture(scope="module")
def oracle():
    import jax.numpy as jnp

    sd = _gpt_sd()
    params = gpt_from_coqui(sd, MICRO_GPT, dtype=jnp.float32)
    # gpt_pass applies BOTH GPT2's ln_f (gpt_lnf) and Coqui's model-level
    # final_norm (lnf); GPT2Model's last_hidden_state includes only the
    # former — make the latter an identity for the comparison
    params = dict(params, lnf_g=jnp.ones(D, jnp.float32),
                  lnf_b=jnp.zeros(D, jnp.float32))
    return _torch_gpt2(sd), params


def test_full_prefix_matches_hf_gpt2(oracle):
    import jax.numpy as jnp

    torch_model, params = oracle
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 7, D)).astype(np.float32) * 0.3

    with torch.no_grad():
        theirs = torch_model(
            inputs_embeds=torch.from_numpy(x)
        ).last_hidden_state.numpy()

    cache = GPTCache.zeros(MICRO_GPT, batch=2, max_len=16, dtype=jnp.float32)
    ours, _ = gpt_pass(params, jnp.asarray(x), jnp.int32(0), cache, MICRO_GPT)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-4, atol=2e-5)


def test_kv_cached_decode_matches_hf_past_key_values(oracle):
    """Incremental decode through our preallocated cache must equal HF's
    past_key_values path position by position."""
    import jax.numpy as jnp

    torch_model, params = oracle
    rng = np.random.default_rng(1)
    prefix = rng.standard_normal((1, 4, D)).astype(np.float32) * 0.3
    steps = [
        rng.standard_normal((1, 1, D)).astype(np.float32) * 0.3
        for _ in range(3)
    ]

    with torch.no_grad():
        out = torch_model(inputs_embeds=torch.from_numpy(prefix), use_cache=True)
        theirs = [out.last_hidden_state.numpy()]
        past = out.past_key_values
        for s in steps:
            out = torch_model(
                inputs_embeds=torch.from_numpy(s), past_key_values=past,
                use_cache=True,
            )
            theirs.append(out.last_hidden_state.numpy())
            past = out.past_key_values

    cache = GPTCache.zeros(MICRO_GPT, batch=1, max_len=16, dtype=jnp.float32)
    ours0, cache = gpt_pass(params, jnp.asarray(prefix), jnp.int32(0), cache, MICRO_GPT)
    cache = cache._replace(pos=jnp.int32(prefix.shape[1]))
    np.testing.assert_allclose(np.asarray(ours0), theirs[0], rtol=2e-4, atol=2e-5)
    for i, s in enumerate(steps):
        ours, cache = gpt_pass(params, jnp.asarray(s), cache.pos, cache, MICRO_GPT)
        cache = cache._replace(pos=cache.pos + 1)
        np.testing.assert_allclose(
            np.asarray(ours), theirs[i + 1], rtol=2e-4, atol=2e-5,
            err_msg=f"decode step {i}",
        )


def test_sampling_pipeline_matches_hf_logits_processors():
    """_sample_token's penalty → temperature → top-k → top-p staging must
    reproduce HF's processor semantics (what Coqui's generate applies):
    identical surviving-token sets and identical greedy picks."""
    import jax
    import jax.numpy as jnp
    from transformers import (
        LogitsProcessorList,
        RepetitionPenaltyLogitsProcessor,
        TemperatureLogitsWarper,
        TopKLogitsWarper,
        TopPLogitsWarper,
    )

    from wis_tpu.models.xtts.gpt import _sample_token

    v = 40
    cfg = GPTConfig(n_audio_vocab=v)
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((1, v)).astype(np.float32) * 3
    hist_tokens = np.array([[3, 7, 7, 11]], np.int64)
    temperature, top_k, top_p, rep = 0.7, 12, 0.8, 7.0

    procs = LogitsProcessorList(
        [
            RepetitionPenaltyLogitsProcessor(rep),
            TemperatureLogitsWarper(temperature),
            TopKLogitsWarper(top_k),
            TopPLogitsWarper(top_p),
        ]
    )
    theirs = procs(
        torch.from_numpy(hist_tokens), torch.from_numpy(logits.copy())
    ).numpy()

    from wis_tpu.models.xtts.gpt import _mask_logits

    hist = jnp.asarray(hist_tokens.astype(np.int32))
    ours = np.asarray(
        _mask_logits(
            jnp.asarray(logits), hist, jnp.float32(temperature),
            jnp.int32(top_k), jnp.float32(top_p), jnp.float32(rep),
        )
    )
    # identical surviving-token sets (ours masks at -1e30, HF at -inf)...
    np.testing.assert_array_equal(ours > -1e29, np.isfinite(theirs))
    # ...identical values on the surviving set...
    keep = ours > -1e29
    np.testing.assert_allclose(ours[keep], theirs[keep], rtol=1e-5)
    # ...and the greedy pick through the public entry point agrees
    ours_tok = _sample_token(
        jnp.asarray(logits), hist, jax.random.PRNGKey(0),
        jnp.float32(temperature), jnp.int32(top_k), jnp.float32(top_p),
        jnp.float32(rep), jnp.bool_(False), cfg,
    )
    assert int(np.asarray(ours_tok)[0]) == int(theirs[0].argmax())
