"""Probe: (1) usable VMEM on this chip, (2) NT dot_general lowering,
(3) mixed blocked-VMEM + resident inputs in one kernel."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wis_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


def probe_vmem(mb):
    n = mb * 1024 * 1024 // 4 // 1024

    def kernel(x_ref, o_ref, scratch):
        scratch[0, :] = x_ref[0, :]
        o_ref[:] = scratch[0, :] * 2.0

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1024,), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n, 1024), jnp.float32)],
    )
    x = jnp.ones((1, 1024), jnp.float32)
    try:
        np.asarray(jax.jit(f)(x))
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:120]
        print(f"  {mb} MB scratch failed: {msg}")
        return False


def probe_nt_dot():
    """w (8, 640) @ V^T where V is (64, 640): contract dim 1 with dim 1."""

    def kernel(w_ref, v_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            w_ref[:], v_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 64), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((8, 640)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((64, 640)), jnp.float32)
    try:
        got = np.asarray(jax.jit(f)(w, v))
        ref = np.asarray(w) @ np.asarray(v).T
        err = np.abs(got - ref).max()
        print(f"  NT dot_general: OK, max err {err:.2e}")
        return True
    except Exception as e:
        print(f"  NT dot_general FAILED: {str(e).splitlines()[0][:150]}")
        return False


def probe_int8_dequant_dot():
    """int8 weight block -> bf16 -> dot, f32 accum (the layer pattern)."""

    def kernel(x_ref, w_ref, s_ref, o_ref):
        w = w_ref[:].astype(jnp.bfloat16)
        y = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
        o_ref[:] = y * s_ref[0, :]

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 1280), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 1280)) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.integers(-127, 127, (1280, 1280)), jnp.int8)
    s = jnp.asarray(rng.standard_normal((1, 1280)) * 0.01, jnp.float32)
    try:
        got = np.asarray(jax.jit(f)(x, w, s))
        ref = (np.asarray(x, np.float32) @ np.asarray(w, np.float32)) * np.asarray(s)
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"  int8-dequant dot: OK, rel err {err:.2e}")
        return True
    except Exception as e:
        print(f"  int8-dequant dot FAILED: {str(e).splitlines()[0][:150]}")
        return False


if __name__ == "__main__":
    print("devices:", jax.devices())
    probe_nt_dot()
    probe_int8_dequant_dot()
    for mb in (16, 32, 64, 96, 110, 120):
        ok = probe_vmem(mb)
        print(f"  VMEM scratch {mb} MB: {'OK' if ok else 'FAIL'}")
        if not ok:
            break
