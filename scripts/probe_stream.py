"""Probe: hand-rolled double-buffered HBM->VMEM weight streaming rate.

Streams the whole large-v2 decoder weight set (L=32 layers x 14 int8
chunks of 1280x1280) through a 2-slot VMEM scratch, with and without a
matmul consuming each chunk. This is the floor for the fused decode-step
kernel: per-step time ~ bytes / effective-bandwidth."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wis_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

L, NC, D = 32, 14, 1280


def build(compute: bool):
    def kernel(w_hbm, x_ref, o_ref, wbuf, acc, sem):
        l = pl.program_id(0)

        def dma(slot, li, ci):
            return pltpu.make_async_copy(
                w_hbm.at[li, ci], wbuf.at[slot], sem.at[slot]
            )

        @pl.when(l == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
            dma(0, 0, 0).start()

        for i in range(NC):
            nxt_l, nxt_c = (l, i + 1) if i + 1 < NC else (l + 1, 0)

            @pl.when((nxt_l < L))
            def _():
                dma((i + 1) % 2, nxt_l, nxt_c).start()

            dma(i % 2, l, i).wait()
            if compute:
                w = wbuf[i % 2].astype(jnp.bfloat16)
                acc[:] += jnp.dot(
                    x_ref[:], w, preferred_element_type=jnp.float32
                )
        o_ref[:] = acc[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(L,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, D, D), jnp.int8),
            pltpu.VMEM((8, D), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


def main():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.integers(-127, 127, (L, NC, D, D)), jnp.int8)
    x = jnp.asarray(rng.standard_normal((8, D)) * 0.1, jnp.bfloat16)
    total_mb = L * NC * D * D / 1e6

    for compute in (False, True):
        f = jax.jit(build(compute))
        t0 = time.perf_counter()
        out = np.asarray(f(w, x))
        print(f"compute={compute}: compile {time.perf_counter()-t0:.1f}s")
        times = []
        for _ in range(8):
            t0 = time.perf_counter()
            out = np.asarray(f(w, x))
            times.append((time.perf_counter() - t0) * 1000)
        med = sorted(times)[len(times) // 2] - 26.0  # tunnel round trip
        bw = total_mb / med  # MB/ms == GB/s
        print(
            f"  stream {total_mb:.0f} MB in {med:.2f} ms -> {bw:.0f} GB/s "
            f"(raw {['%.1f' % t for t in times]})"
        )
        if compute:
            ref = (
                np.asarray(x, np.float32) @ np.asarray(w, np.float32).sum((0, 1))
            )
            err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
            print(f"  accumulation rel err {err:.2e}")


if __name__ == "__main__":
    main()
