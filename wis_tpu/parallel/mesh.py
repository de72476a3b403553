"""Device mesh + sharding rules.

The reference's multi-device story is CTranslate2 `device_index=[0..N-1]`
— an independent model replica per CUDA device with host-side dispatch
(reference main.py:294-295, 341-443) and **no collectives** (SURVEY.md
§5). The TPU equivalents:

- **Replica data-parallelism** (the `device_index` analog): a 1-D
  ``("data",)`` mesh; every parameter is replicated, request batches are
  sharded along ``data``; XLA inserts no collectives on the forward pass
  — each chip transcribes its shard of the batch independently over ICI-
  free math. Host-side, the dynamic batcher feeds the mesh-wide batch.
- **Tensor parallelism** (capacity escape hatch for large-v2 when HBM is
  tight or latency must shrink): attention heads and MLP hidden are
  sharded over a ``("model",)`` axis using GSPMD sharding propagation —
  q/k/v projections column-sharded, output projections row-sharded,
  mlp w1 column- / w2 row-sharded — yielding one `psum` (all-reduce over
  ICI) per attention block and one per MLP, the standard Megatron layout.
- Both compose on a 2-D ``("data", "model")`` mesh.

No NCCL translation happened here: collectives are implied by
`jax.sharding` annotations and inserted by XLA over ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wis_tpu.models.whisper.config import WhisperConfig


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices=None,
) -> Mesh:
    """Build a ("data", "model") mesh over local devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    n = n_data * n_model
    grid = np.asarray(devices[:n]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


# --------------------------------------------------------------------------- #
# Whisper tensor-parallel sharding specs
# --------------------------------------------------------------------------- #
def _block_specs(cross: bool) -> dict:
    """PartitionSpecs for one stacked block pytree (leading layer axis).

    Megatron layout: column-parallel in-projections (shard the output/
    head dim), row-parallel out-projections (shard the input dim) so each
    block needs exactly one all-reduce per attention and one per MLP.
    """
    attn = {
        "q_w": P(None, None, "model"),
        "q_b": P(None, "model"),
        "k_w": P(None, None, "model"),
        "v_w": P(None, None, "model"),
        "v_b": P(None, "model"),
        "o_w": P(None, "model", None),
        "o_b": P(None, None),
    }
    out = {
        "attn_ln": {"g": P(None, None), "b": P(None, None)},
        "attn": dict(attn),
        "mlp_ln": {"g": P(None, None), "b": P(None, None)},
        "mlp": {
            "w1": P(None, None, "model"),
            "b1": P(None, "model"),
            "w2": P(None, "model", None),
            "b2": P(None, None),
        },
    }
    if cross:
        out["cross_ln"] = {"g": P(None, None), "b": P(None, None)}
        out["cross"] = dict(attn)
    return out


def _is_spec(x) -> bool:
    return isinstance(x, P)


def whisper_param_specs(cfg: WhisperConfig, tensor_parallel: bool = True) -> dict:
    """PartitionSpec pytree matching the whisper param pytree layout.

    tensor_parallel=False → fully replicated (pure replica DP)."""
    if not tensor_parallel:
        return jax.tree.map(lambda _: P(), _skeleton(cfg))
    return {
        "encoder": {
            "conv1": {"w": P(None, None, "model"), "b": P("model")},
            "conv2": {"w": P(None, None, "model"), "b": P("model")},
            "pos": P(None, None),
            "blocks": _block_specs(cross=False),
            "ln_post": {"g": P(None), "b": P(None)},
        },
        "decoder": {
            "tok_emb": P(None, None),
            "pos": P(None, None),
            "blocks": _block_specs(cross=True),
            "ln": {"g": P(None), "b": P(None)},
        },
    }


# --------------------------------------------------------------------------- #
# XTTS GPT tensor-parallel sharding specs
# --------------------------------------------------------------------------- #
def xtts_gpt_param_specs() -> dict:
    """PartitionSpec pytree for the XTTS GPT param layout
    (models/xtts/gpt.py random_gpt / convert.gpt_from_coqui).

    Same Megatron layout as the whisper blocks: q/k/v column-parallel
    (whole heads per shard — c_attn is split into per-projection leaves
    at conversion to make that slicing physical), attention output and
    mlp w2 row-parallel → one psum per attention and one per MLP.
    Embeddings, LayerNorms and the (small, 1026-way) audio-code head
    stay replicated; the KV cache shards on its head axis to match
    (see xtts_cache_spec)."""
    col_w, col_b = P(None, None, "model"), P(None, "model")
    row_w, repl_b = P(None, "model", None), P(None, None)
    ln = P(None, None)
    return {
        "text_emb": P(None, None),
        "text_pos": P(None, None),
        "audio_emb": P(None, None),
        "audio_pos": P(None, None),
        "blocks": {
            "ln1_g": ln, "ln1_b": ln,
            "q_w": col_w, "q_b": col_b,
            "k_w": col_w, "k_b": col_b,
            "v_w": col_w, "v_b": col_b,
            "proj_w": row_w, "proj_b": repl_b,
            "ln2_g": ln, "ln2_b": ln,
            "mlp_w1": col_w, "mlp_b1": col_b,
            "mlp_w2": row_w, "mlp_b2": repl_b,
        },
        "gpt_lnf_g": P(None), "gpt_lnf_b": P(None),
        "lnf_g": P(None), "lnf_b": P(None),
        "head_w": P(None, None),
        "head_b": P(None),
    }


def xtts_cache_spec() -> P:
    """KV cache (L, B, H, T, Dh): heads follow the column-sharded q/k/v."""
    return P(None, None, "model", None, None)


def _skeleton(cfg: WhisperConfig) -> dict:
    """A cheap pytree with the same structure as the params (for building
    replicated spec trees without materializing weights)."""
    from wis_tpu.models.whisper.weights import random_params

    micro = WhisperConfig(
        name="skeleton",
        n_audio_state=8,
        n_audio_head=2,
        n_audio_layer=1,
        n_text_state=8,
        n_text_head=2,
        n_text_layer=1,
        n_vocab=64,
        n_audio_ctx=4,
        n_text_ctx=4,
    )
    return random_params(micro, seed=0)


def expand_specs_for_quant(specs, params) -> dict:
    """Adapt a bf16 spec tree to a (possibly) int8-quantized param tree.

    A quantized leaf {"q": (..., K, N), "s": (..., 1, N)} inherits the
    original weight's spec for "q"; the per-output-channel scale "s"
    shards along the same output axis (the spec's last entry) and
    replicates otherwise. Per-ROW quantized leaves (quantize_rows:
    "s" (..., R, 1), e.g. the tok_emb_q logits copy) shard their scale
    along the leading axes instead. Keys with no spec entry fall back to
    their base weight's spec ("tok_emb_q" → "tok_emb").
    """
    from wis_tpu.ops.quant import is_quantized

    def lookup(spec, k):
        if isinstance(spec, dict):
            if k in spec:
                return spec[k]
            if k.endswith("_q") and k[:-2] in spec:
                return spec[k[:-2]]
        return spec

    def walk(spec, param):
        if is_quantized(param):
            if len(spec) and param["s"].shape[-1] == 1:
                s_spec = P(*(tuple(spec[:-1]) + (None,)))
            elif len(spec):
                s_spec = P(*((None,) * (len(spec) - 1) + (spec[-1],)))
            else:
                s_spec = P()
            return {"q": spec, "s": s_spec}
        if isinstance(param, dict):
            return {k: walk(lookup(spec, k), v) for k, v in param.items()}
        return spec

    return {k: walk(lookup(specs, k), v) for k, v in params.items()}


def shard_params(params, mesh: Mesh, specs) -> dict:
    """Place params on the mesh per the spec tree.

    PartitionSpec is a tuple subclass, so the spec tree is mapped as the
    primary tree with an is_leaf guard to stop descent into the specs.
    Quantized param trees (int8 {"q","s"} leaves) are handled by
    expanding the spec tree first.
    """
    from wis_tpu.ops.quant import is_quantized

    has_quant = any(
        is_quantized(x)
        for x in jax.tree.leaves(
            params, is_leaf=lambda x: isinstance(x, dict) and is_quantized(x)
        )
        if isinstance(x, dict)
    )
    if has_quant:
        specs = expand_specs_for_quant(specs, params)
    return jax.tree.map(
        lambda s, a: jax.device_put(a, NamedSharding(mesh, s)),
        specs,
        params,
        is_leaf=_is_spec,
    )


def replicate_params(params, mesh: Mesh) -> dict:
    """Replicate every parameter across the whole mesh (replica DP)."""
    return jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())), params
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over the data axis."""
    return NamedSharding(mesh, P("data"))
