"""Fused logits/top-k head (ops/fused_logits.py) vs the XLA tail."""

import jax
import jax.numpy as jnp
import numpy as np

from wis_tpu.models.whisper.config import WhisperConfig
from wis_tpu.ops.fused_logits import build_fused_logits_topk

CFG = WhisperConfig(
    name="micro-logits",
    n_audio_state=128, n_audio_head=2, n_audio_layer=2,
    n_text_state=128, n_text_head=2, n_text_layer=2,
    n_vocab=1111,  # deliberately not a chunk multiple — exercises padding
)
D = CFG.n_text_state
V = CFG.n_vocab
BK, K = 3, 2


def _xla_tail(x, g, b, emb, sup):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.var(x32, -1, keepdims=True)
    xn = ((x32 - mu) * jax.lax.rsqrt(var + 1e-5) * g + b).astype(jnp.bfloat16)
    logits = jnp.einsum(
        "bd,vd->bv", xn, emb, preferred_element_type=jnp.float32
    ) + sup[None, :]
    val, tok = jax.lax.top_k(logits, K)
    lse = jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)
    return val, tok, lse


def test_fused_logits_matches_xla_tail():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BK, D)), jnp.float32)
    g = jnp.asarray(1 + rng.standard_normal(D) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32)
    emb = jnp.asarray(rng.standard_normal((V, D)) * 0.3, jnp.bfloat16)
    sup = np.zeros(V, np.float32)
    sup[rng.integers(0, V, 50)] = -1e30  # suppressed ids never surface
    sup = jnp.asarray(sup)

    head = build_fused_logits_topk(CFG, bk=BK, k=K)
    got_v, got_t, got_lse = jax.jit(head)(x, g, b, emb, sup)
    want_v, want_t, want_lse = _xla_tail(x, g, b, emb, sup)

    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(want_t))
    np.testing.assert_allclose(
        np.asarray(got_v), np.asarray(want_v), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_lse), np.asarray(want_lse), rtol=1e-4, atol=1e-4
    )
    # suppressed ids must not appear among candidates
    assert not np.isin(np.asarray(got_t), np.where(np.asarray(sup) < 0)[0]).any()
