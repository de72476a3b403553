"""Pallas TPU kernel: fused int8-weight dequant + matmul.

y[b, n] = sum_k x[b, k] * (q[k, n] * s[n])
        = (sum_k x[b, k] * q[k, n]) * s[n]

The weight tile streams HBM→VMEM as int8 (half the bf16 bytes — the
whole point: decode steps are weight-bandwidth-bound), upcasts in VMEM,
and hits the MXU in bf16 with f32 accumulation. Scales fold in once per
output tile. Batch stays resident (decode batches are tiny: beams).

Grid: (N tiles, K tiles), K innermost so each output tile accumulates in
a VMEM scratch across the K sweep and writes once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, nk: int):
    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = q_ref[:].astype(jnp.bfloat16)  # int8 tile upcast in VMEM
    acc_ref[:] += jnp.dot(
        x_ref[:].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(1) == nk - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "block_k"))
def int8_matmul(
    x: jnp.ndarray,  # (..., K) bf16/f32
    q: jnp.ndarray,  # (K, N) int8
    s: jnp.ndarray,  # (1, N) or (N,) f32
    block_n: int = 256,
    block_k: int = 512,
) -> jnp.ndarray:
    """Fused dequant-matmul; returns (..., N) in x.dtype."""
    *lead, k = x.shape
    n = q.shape[1]
    x2 = x.reshape(-1, k)
    b = x2.shape[0]
    # pad batch to the sublane tile
    b_pad = max(8, ((b + 7) // 8) * 8)
    if b_pad != b:
        x2 = jnp.pad(x2, ((0, b_pad - b), (0, 0)))
    s2 = s.reshape(1, n)

    block_n = min(block_n, n)
    block_k = min(block_k, k)
    nk = pl.cdiv(k, block_k)
    grid = (pl.cdiv(n, block_n), nk)

    out = pl.pallas_call(
        functools.partial(_kernel, nk=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b_pad, block_k), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (b_pad, block_n), lambda i, j: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((b_pad, block_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * k * n,
            bytes_accessed=k * n + b_pad * k * 2 + b_pad * n * 2 + 4 * n,
            transcendentals=0,
        ),
    )(x2, q, s2)
    return out[:b].reshape(*lead, n)
