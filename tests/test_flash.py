"""Flash-attention kernel parity (interpret mode) vs the XLA reference."""

import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from wis_tpu.ops.attention import mha
from wis_tpu.ops.flash import flash_attention


def _rand(shape, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.3)


def test_flash_matches_mha_square():
    q, k, v = (_rand((1, 2, 256, 64), s) for s in (0, 1, 2))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(flash_attention(q, k, v, block_q=128, block_k=128))
    ref = np.asarray(mha(q, k, v))
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3)


def test_flash_handles_padding():
    # T=300 pads to 384 internally; padded keys must not leak probability
    q, k, v = (_rand((1, 1, 300, 64), s) for s in (3, 4, 5))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(flash_attention(q, k, v, block_q=128, block_k=128))
    ref = np.asarray(mha(q, k, v))
    assert got.shape == (1, 1, 300, 64)
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3)


def test_flash_batched_heads():
    q, k, v = (_rand((2, 4, 128, 64), s) for s in (6, 7, 8))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(flash_attention(q, k, v, block_q=128, block_k=128))
    ref = np.asarray(mha(q, k, v))
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3)


def test_flash_packed_matches_mha():
    """Packed-layout kernel (no head transposes) vs the reference path."""
    import jax.numpy as jnp
    import numpy as np

    from wis_tpu.ops.attention import merge_heads, mha, qkv_heads
    from wis_tpu.ops.flash import flash_attention_packed

    rng = np.random.default_rng(3)
    b, t, h, dh = 2, 700, 4, 64
    d = h * dh
    q = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)

    got = np.asarray(
        flash_attention_packed(q, k, v, h, block_q=256, block_k=256)
    )
    want = np.asarray(
        merge_heads(mha(qkv_heads(q, h), qkv_heads(k, h), qkv_heads(v, h)))
    )
    assert got.shape == want.shape == (b, t, d)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)
