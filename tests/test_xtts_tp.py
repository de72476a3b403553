"""XTTS GPT tensor parallelism: the Megatron specs in
parallel/mesh.py:xtts_gpt_param_specs must leave the decode math
bit-compatible with the single-device program (the TTS half of the
multi-chip story; the whisper half is covered by test_parallel.py and
the driver dryrun)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from wis_tpu.models.xtts.gpt import (
    GPTConfig,
    build_decode_chunk,
    build_prefill,
    random_gpt,
)
from wis_tpu.parallel.mesh import (
    make_mesh,
    shard_params,
    xtts_gpt_param_specs,
)

CFG = GPTConfig(
    n_layer=2,
    n_head=4,
    d_model=32,
    n_text_vocab=64,
    n_audio_vocab=36,
    max_text_tokens=16,
    max_audio_tokens=24,
    start_audio_token=34,
    stop_audio_token=35,
)
COND, TEXT, CHUNK = 2, 4, 6
MAX_LEN = COND + TEXT + 1 + CFG.max_audio_tokens


def _decode_once(params):
    """prefill + one greedy decode chunk; returns (tokens, latents)."""
    prefill = build_prefill(CFG, batch=1, cond_len=COND, text_len=TEXT, max_len=MAX_LEN)
    decode = build_decode_chunk(CFG, batch=1, chunk=CHUNK, max_len=MAX_LEN)
    cond = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, COND, CFG.d_model)),
        jnp.float32,
    )
    text = jnp.asarray([[3, 5, 7, 9]], jnp.int32)
    _, cache = prefill(params, cond, text)
    tokens, latents, *_ = decode(
        params,
        jnp.full((1,), CFG.start_audio_token, jnp.int32),
        cache,
        jnp.zeros((1, CFG.max_audio_tokens), jnp.int32),
        jnp.int32(0),
        jax.random.PRNGKey(0),
        jnp.float32(1.0),
        jnp.int32(5),
        jnp.float32(0.9),
        jnp.float32(2.0),
        jnp.bool_(False),  # greedy: TP psum reorder must not flip tokens
    )
    return np.asarray(tokens), np.asarray(latents)


@pytest.mark.parametrize("quant", ["none", "int8"])
@pytest.mark.parametrize("n_model", [2, 4])
def test_tp_decode_matches_single_device(n_model, quant):
    """TP must be a pure layout change — including in production param
    form (int8 block weights; expand_specs_for_quant shards the
    per-output-channel scales along the same axis as the weights)."""
    if len(jax.devices()) < n_model:
        pytest.skip("needs the virtual multi-device CPU mesh")
    params = random_gpt(CFG, seed=0, dtype=jnp.float32)
    if quant == "int8":
        from wis_tpu.ops.quant import quantize_gpt_params

        params = quantize_gpt_params(params)
    ref_tokens, ref_latents = _decode_once(params)

    mesh = make_mesh(n_data=1, n_model=n_model)
    sharded = shard_params(params, mesh, xtts_gpt_param_specs())
    tp_tokens, tp_latents = _decode_once(sharded)

    np.testing.assert_array_equal(tp_tokens, ref_tokens)
    np.testing.assert_allclose(tp_latents, ref_latents, rtol=1e-4, atol=1e-5)


def test_specs_cover_param_tree():
    """Every GPT param leaf has a spec (no silently-replicated leftovers
    from layout drift) and head-sharded axes divide evenly."""
    params = random_gpt(CFG, seed=0, dtype=jnp.float32)
    specs = xtts_gpt_param_specs()
    # identical tree structure: tree.map would raise on mismatch
    jax.tree.map(
        lambda s, a: None, specs, params,
        is_leaf=lambda x: isinstance(x, P),
    )
    for leaf in ("q_w", "k_w", "v_w"):
        assert params["blocks"][leaf].shape[-1] == CFG.d_model
