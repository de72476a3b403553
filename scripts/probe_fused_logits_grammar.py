"""TPU bring-up for the grammar-enabled fused logits head.

Compiles ops/fused_logits with grammar=True at large-v2 beam-5 shapes on
the real chip and checks candidates/lse against the XLA-mask tail.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wis_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from wis_tpu.models.whisper.config import WHISPER_CONFIGS
from wis_tpu.models.whisper.tokenizer import EOT, TIMESTAMP_BASE
from wis_tpu.ops.fused_logits import build_fused_logits_topk


def main():
    cfg = WHISPER_CONFIGS["large"]
    D, V = cfg.n_text_state, cfg.n_vocab
    BK, K = 5, 5
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BK, D)), jnp.float32)
    g = jnp.asarray(1 + rng.standard_normal(D) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32)
    emb = jnp.asarray(rng.standard_normal((V, D)) * 0.05, jnp.bfloat16)
    sup = jnp.zeros(V, jnp.float32)
    ts_state = jnp.asarray(
        [
            [1, 0, 0, 0],
            [0, 1, 0, 0],
            [0, 0, TIMESTAMP_BASE + 500, 0],
            [1, 0, 0, 0],
            [0, 0, 0, 0],
        ],
        jnp.int32,
    )

    head = build_fused_logits_topk(
        cfg, bk=BK, k=K, grammar=True, ts_base=TIMESTAMP_BASE, eot=EOT
    )
    got_v, got_t, got_lse = jax.jit(head)(x, g, b, emb, sup, ts_state)
    got_t = np.asarray(got_t)
    got_lse = np.asarray(got_lse)

    @jax.jit
    def xla_tail(x, g, b, emb, sup, ts_state):
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, -1, keepdims=True)
        var = jnp.var(x32, -1, keepdims=True)
        xn = (
            (x32 - mu) * jax.lax.rsqrt(var + 1e-5) * g + b
        ).astype(jnp.bfloat16)
        logits = jnp.einsum(
            "bd,vd->bv", xn, emb, preferred_element_type=jnp.float32
        ) + sup[None, :]
        ids = jnp.arange(V)
        is_ts = (ids >= TIMESTAMP_BASE)[None, :]
        bad = (
            ((ts_state[:, 0:1] > 0) & ~(is_ts | (ids == EOT)[None, :]))
            | ((ts_state[:, 1:2] > 0) & is_ts)
            | (is_ts & (ids[None, :] < ts_state[:, 2:3]))
        )
        logits = jnp.where(bad, -1e30, logits)
        val, tok = jax.lax.top_k(logits, K)
        lse = jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)
        return val, tok, lse

    want_v, want_t, want_lse = xla_tail(x, g, b, emb, sup, ts_state)
    want_t = np.asarray(want_t)
    want_lse = np.asarray(want_lse)

    np.testing.assert_array_equal(np.sort(got_t, -1), np.sort(want_t, -1))
    np.testing.assert_allclose(got_lse, want_lse, rtol=1e-4, atol=1e-4)
    assert ((got_t[0] >= TIMESTAMP_BASE) | (got_t[0] == EOT)).all()
    assert (got_t[1] < TIMESTAMP_BASE).all()
    print("grammar head OK on", jax.default_backend(), "tokens", got_t[0])


if __name__ == "__main__":
    main()
