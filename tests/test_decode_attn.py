"""Ancestry-indirection decode attention prototype (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from wis_tpu.ops.decode_attn import (
    ancestry_attention,
    ancestry_attention_reference,
)

BK, H, DH, T = 4, 4, 64, 128


def _setup(seed=0, pos=10):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((BK, H, DH)).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.standard_normal((BK, H, DH, T)).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.standard_normal((BK, H, DH, T)).astype(np.float32) * 0.3)
    # random but valid ancestry: row index per (beam, position)
    anc = jnp.asarray(rng.integers(0, BK, (BK, T)), jnp.int32)
    return q, k, v, anc, jnp.int32(pos)


def test_reference_matches_identity_ancestry():
    """Identity ancestry == standard attention over each beam's own row."""
    q, k, v, _, pos = _setup(1)
    anc = jnp.tile(jnp.arange(BK, dtype=jnp.int32)[:, None], (1, T))
    out = ancestry_attention_reference(q, k, v, anc, pos)
    # manual per-beam attention
    scale = DH ** -0.5
    scores = jnp.einsum("bhd,bhdt->bht", q, k) * scale
    valid = jnp.arange(T)[None, None, :] <= pos
    w = jax.nn.softmax(jnp.where(valid, scores, -1e30), axis=-1)
    expected = jnp.einsum("bht,bhdt->bhd", w, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_kernel_matches_reference():
    q, k, v, anc, pos = _setup(2, pos=37)
    ref = np.asarray(ancestry_attention_reference(q, k, v, anc, pos))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(ancestry_attention(q, k, v, anc, pos))
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3)


def test_kernel_respects_position_mask():
    q, k, v, anc, _ = _setup(3)
    with pltpu.force_tpu_interpret_mode():
        a = np.asarray(ancestry_attention(q, k, v, anc, jnp.int32(5)))
        b = np.asarray(ancestry_attention(q, k, v, anc, jnp.int32(90)))
    # different valid windows → different outputs
    assert not np.allclose(a, b)
