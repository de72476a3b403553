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


def _xla_logits(x, g, b, emb, sup):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.var(x32, -1, keepdims=True)
    xn = ((x32 - mu) * jax.lax.rsqrt(var + 1e-5) * g + b).astype(jnp.bfloat16)
    return jnp.einsum(
        "bd,vd->bv", xn, emb, preferred_element_type=jnp.float32
    ) + sup[None, :]


def _xla_tail(x, g, b, emb, sup):
    logits = _xla_logits(x, g, b, emb, sup)
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


def test_fused_logits_timestamp_grammar():
    """grammar=True must apply the timestamp rules identically to the
    XLA masking in decoding/beam.py (which mirrors HF's
    WhisperTimeStampLogitsProcessor rule-for-rule), per beam row —
    including the timestamp-probability force rule."""
    ts_base, eot = 900, 50  # micro-vocab stand-ins for 50364 / 50257
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((BK, D)), jnp.float32)
    g = jnp.asarray(1 + rng.standard_normal(D) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32)
    emb = jnp.asarray(rng.standard_normal((V, D)) * 0.3, jnp.bfloat16)
    sup = jnp.zeros(V, jnp.float32)
    # rows: [0] needs a timestamp next, [1] needs text next, [2] free but
    # monotonicity-floored at ts id 1000 (col 2 carries the min legal id)
    ts_state = jnp.asarray(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1000, 0]], jnp.int32
    )

    head = build_fused_logits_topk(
        CFG, bk=BK, k=K, grammar=True, ts_base=ts_base, eot=eot
    )
    got_v, got_t, got_lse = jax.jit(head)(x, g, b, emb, sup, ts_state)

    # XLA reference: same bf16 einsum as the kernel, grammar as
    # full-row masks (the decoding/beam.py formulation)
    logits = np.array(_xla_logits(x, g, b, emb, sup))
    ids = np.arange(V)
    is_ts = ids >= ts_base
    logits[0, ids < eot] = -1e30  # no plain text after an unpaired ts
    logits[1, is_ts] = -1e30
    logits[2, is_ts & (ids < 1000)] = -1e30
    # timestamp-probability force rule (HF/openai): if the summed ts
    # probability beats the best text token, only timestamps are legal
    for r in range(BK):
        mx = logits[r].max()
        lse_ts = np.log(np.exp(logits[r, ts_base:] - mx).sum()) + mx
        if lse_ts > logits[r, :ts_base].max():
            logits[r, :ts_base] = -1e30
    for r in range(BK):
        want = np.argsort(-logits[r], kind="stable")[:K]
        np.testing.assert_array_equal(np.sort(np.asarray(got_t)[r]), np.sort(want))
    want_lse = np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)) + logits.max(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(got_lse), want_lse, rtol=1e-4, atol=1e-4)
    # rule sanity: row 0 candidates are ts-or-specials, row 1 has no ts
    t0 = np.asarray(got_t)[0]
    assert (t0 >= eot).all()
    assert (np.asarray(got_t)[1] < ts_base).all()
    assert (np.asarray(got_t)[2][np.asarray(got_t)[2] >= ts_base] >= 1000).all()


def test_fused_logits_int8_emb_matches_xla_int8_tail():
    """emb_int8=True must equal the XLA int8 logits tail exactly (both
    dot the int8 rows in bf16 — exact, int8 fits the mantissa — and
    scale after the contraction; models/whisper/model.py mirrors this)."""
    from wis_tpu.ops.quant import quantize_rows

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((BK, D)), jnp.float32)
    g = jnp.asarray(1 + rng.standard_normal(D) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32)
    emb = jnp.asarray(rng.standard_normal((V, D)) * 0.3, jnp.bfloat16)
    leaf = quantize_rows(emb)
    sup = np.zeros(V, np.float32)
    sup[rng.integers(0, V, 50)] = -1e30
    sup = jnp.asarray(sup)

    head = build_fused_logits_topk(CFG, bk=BK, k=K, emb_int8=True)
    got_v, got_t, got_lse = jax.jit(head)(x, g, b, leaf, sup)

    def _xla_int8_tail(x, g, b, leaf, sup):
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, -1, keepdims=True)
        var = jnp.var(x32, -1, keepdims=True)
        xn = ((x32 - mu) * jax.lax.rsqrt(var + 1e-5) * g + b).astype(
            jnp.bfloat16
        )
        logits = jnp.einsum(
            "bd,vd->bv", xn, leaf["q"].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ) * leaf["s"][:, 0][None, :] + sup[None, :]
        val, tok = jax.lax.top_k(logits, K)
        lse = jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)
        return val, tok, lse

    want_v, want_t, want_lse = _xla_int8_tail(x, g, b, leaf, sup)
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(want_t))
    np.testing.assert_allclose(
        np.asarray(got_v), np.asarray(want_v), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_lse), np.asarray(want_lse), rtol=1e-4, atol=1e-4
    )
    # the int8 approximation itself stays within quant noise of bf16
    full = _xla_tail(x, g, b, emb, sup)
    np.testing.assert_allclose(
        np.asarray(got_v), np.asarray(full[0]), rtol=0.05, atol=0.05
    )
