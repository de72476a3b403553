"""gelu approximation accuracy: the tanh-form fit must stay ≥100× inside
the HF-parity tolerance (2e-3) that exact-erf gelu is held to."""

import numpy as np
from scipy import special

import jax.numpy as jnp

from wis_tpu.ops.gelu import gelu


def _exact(x64):
    return 0.5 * x64 * (1.0 + special.erf(x64 / np.sqrt(2.0)))


def test_gelu_max_error_f32():
    x = np.linspace(-30.0, 30.0, 400001).astype(np.float32)
    got = np.asarray(gelu(jnp.asarray(x)), np.float64)
    err = np.abs(got - _exact(x.astype(np.float64)))
    assert err.max() < 2e-5, err.max()


def test_gelu_tails_exact():
    x = np.array([-1e4, -100.0, -6.001, 6.001, 100.0, 1e4], np.float32)
    got = np.asarray(gelu(jnp.asarray(x)), np.float32)
    np.testing.assert_array_equal(got[:3], [0.0, 0.0, 0.0])
    np.testing.assert_array_equal(got[3:], x[3:])


def test_gelu_bf16_within_ulp_or_absolute_budget():
    """In bf16 (production activation dtype) every output is within one
    bf16 ulp of rounded exact gelu OR within the 2e-5 absolute budget
    (tiny-magnitude tail values where relative error is meaningless)."""
    x32 = np.linspace(-6.0, 6.0, 200001).astype(np.float32)
    x = jnp.asarray(x32, jnp.bfloat16)
    got = np.asarray(gelu(x).astype(jnp.float32), np.float64)
    exact = _exact(np.asarray(x, np.float32).astype(np.float64))
    exact_b = np.asarray(jnp.asarray(exact, jnp.bfloat16).astype(jnp.float32))
    d = np.abs(got - exact_b)
    ulp = np.abs(exact_b) * 2.0**-8
    assert ((d <= 2 * ulp + 1e-12) | (d <= 5e-5)).all()
    # and in the significant range the rounding agrees for most values
    sig = np.abs(exact_b) > 1e-2
    assert (got[sig] == exact_b[sig]).mean() > 0.95
