"""Single-pass Pallas LayerNorm: bf16 in/out, f32 statistics.

The production `layer_norm` (models/whisper/model.py) upcasts the whole
activation to f32 and lets XLA schedule the mean/var reductions — on the
large-v2 encoder that measures ≈4.2 ms across 65 instances (BENCH.md
round-3 attribution), several HBM passes per LN. This kernel does one
read + one write per tile: statistics accumulate in f32 on the VPU while
the tile sits in VMEM, normalization and affine apply in place, and the
output rounds straight back to the input dtype.

Numerics match the f32-cast formulation (same mean/var definition, f32
math throughout) — on-chip max|Δ| is probed in scripts/probe_stem_ln.py.
Reference analog: CTranslate2's fused LayerNorm CUDA kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: rows per grid step — one (BT, D) tile of bf16 activations in VMEM
BT = 256


def _ln_kernel(x_ref, gb_ref, o_ref, *, eps: float):
    x32 = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) * (x32 - mu), axis=-1, keepdims=True)
    out = (x32 - mu) * jax.lax.rsqrt(var + eps) * gb_ref[0][None, :] + gb_ref[1][None, :]
    o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps",))
def layer_norm_pallas(
    x: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-5
) -> jnp.ndarray:
    """LayerNorm over the last axis. x (..., D); g, b (D,). Returns
    x.dtype. D must be lane-aligned (multiple of 128)."""
    d = x.shape[-1]
    rows = 1
    for s in x.shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, d)
    gb = jnp.stack([g, b]).astype(jnp.float32)
    bt = min(BT, rows) if rows % min(BT, rows) == 0 else BT
    grid = (rows + bt - 1) // bt
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((bt, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        interpret=jax.default_backend() == "cpu",
    )(x2, gb)
    return out.reshape(x.shape)
