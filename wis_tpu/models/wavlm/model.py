"""WavLM x-vector speaker-verification model in JAX.

The reference runs speaker verification through HF's torch
`WavLMForXVector` (reference main.py:306-316, 826-828: wavlm-base-plus-sv
→ 512-dim x-vector → cosine vs enrolled embeddings, threshold 0.75).
This is the same architecture natively in JAX:

  raw 16 kHz PCM
    → 7-layer conv feature encoder (512 ch, stride 320 total)
    → layer-norm + projection to hidden size
    → conv positional embedding (groups=16, kernel=128)
    → transformer encoder with WavLM's *gated relative position bias*
    → TDNN x-vector head (dilated windows → statistics pooling →
      512-dim embedding)

Weight layout follows HF's `WavLMForXVector` state_dict so real
checkpoints convert directly; tests validate numerical parity against a
randomly-initialized HF torch model (tests/test_wavlm.py).
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("wis_tpu")


@dataclass(frozen=True)
class WavLMConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    num_buckets: int = 320
    max_bucket_distance: int = 800
    tdnn_dim: Tuple[int, ...] = (512, 512, 512, 512, 1500)
    tdnn_kernel: Tuple[int, ...] = (5, 3, 3, 1, 1)
    tdnn_dilation: Tuple[int, ...] = (1, 2, 3, 1, 1)
    xvector_output_dim: int = 512


BASE_PLUS_SV = WavLMConfig()


def _layer_norm(x, g, b, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return (((x32 - mu) * jax.lax.rsqrt(var + eps)) * g + b).astype(x.dtype)


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


# --------------------------------------------------------------------------- #
# Feature encoder (raw waveform → (T', 512))
# --------------------------------------------------------------------------- #
def feature_encoder(params: Dict, audio: jnp.ndarray, cfg: WavLMConfig) -> jnp.ndarray:
    """audio (B, N) → (B, T', conv_dim[-1]); total stride 320 (20 ms)."""
    x = audio[:, :, None]  # (B, N, 1)
    for i, (k, s) in enumerate(zip(cfg.conv_kernel, cfg.conv_stride)):
        layer = params["conv_layers"][i]
        x = jax.lax.conv_general_dilated(
            x,
            layer["w"],  # (K, C_in, C_out)
            window_strides=(s,),
            padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.float32,
        )
        if "b" in layer:
            x = x + layer["b"]
        x = x.astype(audio.dtype)
        if i == 0 and "gn_g" in layer:
            # GroupNorm(groups == channels) — i.e. per-channel instance norm
            x32 = x.astype(jnp.float32)
            mu = x32.mean(axis=1, keepdims=True)
            var = x32.var(axis=1, keepdims=True)
            x = (
                (x32 - mu) * jax.lax.rsqrt(var + 1e-5) * layer["gn_g"]
                + layer["gn_b"]
            ).astype(x.dtype)
        x = _gelu(x)
    return x


# --------------------------------------------------------------------------- #
# Gated relative position bias (the WavLM-specific attention ingredient)
# --------------------------------------------------------------------------- #
def _relative_position_buckets(
    n_query: int, n_key: int, num_buckets: int, max_distance: int
) -> np.ndarray:
    """T5-style bidirectional log-bucketed relative positions (host-side,
    static shapes)."""
    context = np.arange(n_query)[:, None]
    memory = np.arange(n_key)[None, :]
    relative = memory - context
    num_buckets //= 2
    buckets = (relative > 0).astype(np.int64) * num_buckets
    relative = np.abs(relative)
    max_exact = num_buckets // 2
    is_small = relative < max_exact
    large = max_exact + (
        np.log(np.maximum(relative, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, num_buckets - 1)
    buckets += np.where(is_small, relative, large)
    return buckets  # (n_query, n_key)


def _position_bias(params: Dict, seq_len: int, cfg: WavLMConfig) -> jnp.ndarray:
    """(H, T, T) bias from the shared bucket embedding (layer 0 computes,
    all layers reuse — HF behavior)."""
    buckets = _relative_position_buckets(
        seq_len, seq_len, cfg.num_buckets, cfg.max_bucket_distance
    )
    emb = params["rel_attn_embed"]  # (num_buckets, H)
    bias = jnp.take(emb, jnp.asarray(buckets), axis=0)  # (T, T, H)
    return bias.transpose(2, 0, 1)


def _attention(
    x: jnp.ndarray, layer: Dict, pos_bias: jnp.ndarray, cfg: WavLMConfig
) -> jnp.ndarray:
    b, t, d = x.shape
    h = cfg.num_heads
    dh = d // h

    def proj(w, bias=None):
        y = x @ w
        if bias is not None:
            y = y + bias
        return y.reshape(b, t, h, dh).transpose(0, 2, 1, 3)

    q = proj(layer["q_w"], layer["q_b"])
    k = proj(layer["k_w"], layer["k_b"])
    v = proj(layer["v_w"], layer["v_b"])

    # gated relative position bias (HF WavLMAttention): per-query gates
    # modulate the shared bias
    gate_proj = q @ layer["gru_w"] + layer["gru_b"]  # (B,H,T,8)
    gate_proj = gate_proj.reshape(b, h, t, 2, 4).sum(-1)
    gates = jax.nn.sigmoid(gate_proj)  # (B,H,T,2)
    gate_a = gates[..., 0:1]
    gate_b = gates[..., 1:2]
    gate_out = gate_a * (gate_b * layer["gru_const"] - 1.0) + 2.0  # (B,H,T,1)
    gated_bias = gate_out * pos_bias[None]  # (B,H,T,T)

    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (dh ** -0.5)
    scores = scores + gated_bias.astype(scores.dtype)
    w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, d)
    return ctx @ layer["o_w"] + layer["o_b"]


def encoder(params: Dict, x: jnp.ndarray, cfg: WavLMConfig) -> jnp.ndarray:
    """Feature-projected hidden states → transformer output (post-LN
    encoder, HF do_stable_layer_norm=False)."""
    # conv positional embedding
    pc = params["pos_conv"]
    pos = jax.lax.conv_general_dilated(
        x,
        pc["w"],  # (K, C_in/groups, C_out)
        window_strides=(1,),
        padding=[(cfg.num_conv_pos_embeddings // 2,) * 2],
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=cfg.num_conv_pos_embedding_groups,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    pos = pos + pc["b"]
    if cfg.num_conv_pos_embeddings % 2 == 0:
        pos = pos[:, :-1]  # SamePad trim for even kernels
    x = x + _gelu(pos)
    x = _layer_norm(x, params["enc_ln_g"], params["enc_ln_b"])

    pos_bias = _position_bias(params, x.shape[1], cfg)
    for layer in params["layers"]:
        attn = _attention(x, layer, pos_bias, cfg)
        x = _layer_norm(x + attn, layer["ln1_g"], layer["ln1_b"])
        ff = _gelu(x @ layer["ff1_w"] + layer["ff1_b"])
        ff = ff @ layer["ff2_w"] + layer["ff2_b"]
        x = _layer_norm(x + ff, layer["ln2_g"], layer["ln2_b"])
    return x


# --------------------------------------------------------------------------- #
# TDNN x-vector head
# --------------------------------------------------------------------------- #
def _tdnn_layer(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, kernel: int, dilation: int):
    """HF TDNNLayer: linear over a dilated window of frames, then ReLU.

    x (B, T, C_in), w (C_in*kernel, C_out).
    """
    if kernel == 1:
        y = x @ w + b
    else:
        span = (kernel - 1) * dilation + 1
        windows = [x[:, i * dilation : x.shape[1] - span + 1 + i * dilation] for i in range(kernel)]
        stacked = jnp.concatenate(windows, axis=-1)  # (B, T', C_in*kernel)
        y = stacked @ w + b
    return jax.nn.relu(y)


def xvector_embed(params: Dict, audio: jnp.ndarray, cfg: WavLMConfig) -> jnp.ndarray:
    """Raw PCM (B, N) float32 → x-vector embeddings (B, 512) — the
    `.embeddings` output of HF WavLMForXVector."""
    feats = feature_encoder(params["feature_encoder"], audio, cfg)
    x = _layer_norm(feats, params["fp_ln_g"], params["fp_ln_b"])
    x = x @ params["fp_w"] + params["fp_b"]
    x = encoder(params["encoder"], x, cfg)
    x = x @ params["proj_w"] + params["proj_b"]
    for i, (k, dil) in enumerate(zip(cfg.tdnn_kernel, cfg.tdnn_dilation)):
        t = params["tdnn"][i]
        x = _tdnn_layer(x, t["w"], t["b"], k, dil)
    mean = x.mean(axis=1)
    std = x.std(axis=1)
    stats = jnp.concatenate([mean, std], axis=-1)
    return stats @ params["fe_w"] + params["fe_b"]


# --------------------------------------------------------------------------- #
# Weights: HF conversion + random init
# --------------------------------------------------------------------------- #
def params_from_hf_wavlm(sd: Dict[str, np.ndarray], cfg: WavLMConfig, dtype=jnp.float32) -> Dict:
    """Convert an HF WavLMForXVector state_dict (numpy tensors)."""
    g = lambda k: jnp.asarray(sd[k], dtype)  # noqa: E731

    def lin(prefix):  # torch Linear (out,in) → (in,out)
        return jnp.asarray(sd[prefix + ".weight"].T, dtype), g(prefix + ".bias")

    conv_layers = []
    for i in range(len(cfg.conv_kernel)):
        p = f"wavlm.feature_extractor.conv_layers.{i}"
        layer = {
            "w": jnp.asarray(sd[p + ".conv.weight"].transpose(2, 1, 0), dtype)
        }
        if p + ".conv.bias" in sd:
            layer["b"] = g(p + ".conv.bias")
        if i == 0 and p + ".layer_norm.weight" in sd:
            layer["gn_g"] = g(p + ".layer_norm.weight")
            layer["gn_b"] = g(p + ".layer_norm.bias")
        conv_layers.append(layer)

    # weight-normed positional conv: torch ≥2.1 stores parametrizations
    pc = "wavlm.encoder.pos_conv_embed.conv"
    if pc + ".parametrizations.weight.original0" in sd:
        g0 = sd[pc + ".parametrizations.weight.original0"]
        v = sd[pc + ".parametrizations.weight.original1"]
        norm = np.linalg.norm(v, axis=(0, 1), keepdims=True)
        w = g0 * v / np.maximum(norm, 1e-12)
    elif pc + ".weight_g" in sd:
        g0, v = sd[pc + ".weight_g"], sd[pc + ".weight_v"]
        norm = np.linalg.norm(v, axis=(0, 1), keepdims=True)
        w = g0 * v / np.maximum(norm, 1e-12)
    else:
        w = sd[pc + ".weight"]
    pos_conv = {
        # torch grouped conv weight (C_out, C_in/groups, K) → (K, C_in/groups, C_out)
        "w": jnp.asarray(w.transpose(2, 1, 0), dtype),
        "b": g(pc + ".bias"),
    }

    layers = []
    for i in range(cfg.num_layers):
        p = f"wavlm.encoder.layers.{i}"
        qw, qb = lin(p + ".attention.q_proj")
        kw, kb = lin(p + ".attention.k_proj")
        vw, vb = lin(p + ".attention.v_proj")
        ow, ob = lin(p + ".attention.out_proj")
        gru_w, gru_b = lin(p + ".attention.gru_rel_pos_linear")
        ff1w, ff1b = lin(p + ".feed_forward.intermediate_dense")
        ff2w, ff2b = lin(p + ".feed_forward.output_dense")
        layers.append(
            {
                "q_w": qw, "q_b": qb, "k_w": kw, "k_b": kb,
                "v_w": vw, "v_b": vb, "o_w": ow, "o_b": ob,
                "gru_w": gru_w, "gru_b": gru_b,
                "gru_const": g(p + ".attention.gru_rel_pos_const"),
                "ln1_g": g(p + ".layer_norm.weight"),
                "ln1_b": g(p + ".layer_norm.bias"),
                "ff1_w": ff1w, "ff1_b": ff1b,
                "ff2_w": ff2w, "ff2_b": ff2b,
                "ln2_g": g(p + ".final_layer_norm.weight"),
                "ln2_b": g(p + ".final_layer_norm.bias"),
            }
        )

    fp_w, fp_b = lin("wavlm.feature_projection.projection")
    proj_w, proj_b = lin("projector")
    tdnn = []
    for i in range(len(cfg.tdnn_kernel)):
        w_, b_ = lin(f"tdnn.{i}.kernel")
        tdnn.append({"w": w_, "b": b_})
    fe_w, fe_b = lin("feature_extractor")

    return {
        "feature_encoder": {"conv_layers": conv_layers},
        "fp_ln_g": g("wavlm.feature_projection.layer_norm.weight"),
        "fp_ln_b": g("wavlm.feature_projection.layer_norm.bias"),
        "fp_w": fp_w,
        "fp_b": fp_b,
        "encoder": {
            "pos_conv": pos_conv,
            "enc_ln_g": g("wavlm.encoder.layer_norm.weight"),
            "enc_ln_b": g("wavlm.encoder.layer_norm.bias"),
            "rel_attn_embed": g("wavlm.encoder.layers.0.attention.rel_attn_embed.weight"),
            "layers": layers,
        },
        "proj_w": proj_w,
        "proj_b": proj_b,
        "tdnn": tdnn,
        "fe_w": fe_w,
        "fe_b": fe_b,
    }


def random_wavlm(cfg: WavLMConfig, seed: int = 0, dtype=jnp.float32) -> Dict:
    rng = np.random.default_rng(seed)

    def dense(*shape, scale=None):
        scale = scale or 1.0 / np.sqrt(shape[0])
        return jnp.asarray(
            rng.standard_normal(shape).astype(np.float32) * scale, dtype
        )

    d, hsz = cfg.conv_dim[0], cfg.hidden_size
    conv_layers = []
    c_in = 1
    for i, (k, _s) in enumerate(zip(cfg.conv_kernel, cfg.conv_stride)):
        layer = {"w": dense(k, c_in, cfg.conv_dim[i], scale=0.05)}
        if cfg.conv_bias:
            layer["b"] = jnp.zeros(cfg.conv_dim[i], dtype)
        if i == 0:
            layer["gn_g"] = jnp.ones(cfg.conv_dim[0], jnp.float32)
            layer["gn_b"] = jnp.zeros(cfg.conv_dim[0], jnp.float32)
        conv_layers.append(layer)
        c_in = cfg.conv_dim[i]

    layers = []
    for _ in range(cfg.num_layers):
        layers.append(
            {
                "q_w": dense(hsz, hsz), "q_b": jnp.zeros(hsz, dtype),
                "k_w": dense(hsz, hsz), "k_b": jnp.zeros(hsz, dtype),
                "v_w": dense(hsz, hsz), "v_b": jnp.zeros(hsz, dtype),
                "o_w": dense(hsz, hsz), "o_b": jnp.zeros(hsz, dtype),
                "gru_w": dense(hsz // cfg.num_heads, 8),
                "gru_b": jnp.zeros(8, dtype),
                "gru_const": jnp.ones((1, cfg.num_heads, 1, 1), dtype),
                "ln1_g": jnp.ones(hsz, jnp.float32),
                "ln1_b": jnp.zeros(hsz, jnp.float32),
                "ff1_w": dense(hsz, cfg.intermediate_size),
                "ff1_b": jnp.zeros(cfg.intermediate_size, dtype),
                "ff2_w": dense(cfg.intermediate_size, hsz),
                "ff2_b": jnp.zeros(hsz, dtype),
                "ln2_g": jnp.ones(hsz, jnp.float32),
                "ln2_b": jnp.zeros(hsz, jnp.float32),
            }
        )

    tdnn = []
    c = cfg.xvector_output_dim
    for i, (k, _dil) in enumerate(zip(cfg.tdnn_kernel, cfg.tdnn_dilation)):
        tdnn.append(
            {"w": dense(c * k, cfg.tdnn_dim[i]), "b": jnp.zeros(cfg.tdnn_dim[i], dtype)}
        )
        c = cfg.tdnn_dim[i]

    return {
        "feature_encoder": {"conv_layers": conv_layers},
        "fp_ln_g": jnp.ones(d, jnp.float32),
        "fp_ln_b": jnp.zeros(d, jnp.float32),
        "fp_w": dense(d, hsz),
        "fp_b": jnp.zeros(hsz, dtype),
        "encoder": {
            "pos_conv": {
                "w": dense(
                    cfg.num_conv_pos_embeddings,
                    hsz // cfg.num_conv_pos_embedding_groups,
                    hsz,
                    scale=0.02,
                ),
                "b": jnp.zeros(hsz, dtype),
            },
            "enc_ln_g": jnp.ones(hsz, jnp.float32),
            "enc_ln_b": jnp.zeros(hsz, jnp.float32),
            "rel_attn_embed": dense(cfg.num_buckets, cfg.num_heads, scale=0.02),
            "layers": layers,
        },
        "proj_w": dense(hsz, cfg.xvector_output_dim),
        "proj_b": jnp.zeros(cfg.xvector_output_dim, dtype),
        "tdnn": tdnn,
        "fe_w": dense(cfg.tdnn_dim[-1] * 2, cfg.xvector_output_dim),
        "fe_b": jnp.zeros(cfg.xvector_output_dim, dtype),
    }


def load_or_init_wavlm(
    model_dir: Optional[str] = None, cfg: WavLMConfig = BASE_PLUS_SV, dtype=jnp.float32
) -> Dict:
    if model_dir and os.path.isdir(model_dir):
        try:
            from safetensors import safe_open

            files = [f for f in os.listdir(model_dir) if f.endswith(".safetensors")]
            if files:
                sd = {}
                for fname in files:
                    with safe_open(os.path.join(model_dir, fname), framework="np") as f:
                        for key in f.keys():
                            sd[key] = f.get_tensor(key)
                logger.info("WAVLM: loading weights from %s", model_dir)
                return params_from_hf_wavlm(sd, cfg, dtype)
        except Exception as e:  # noqa: BLE001
            logger.warning("WAVLM: weight load failed (%s); using random init", e)
    logger.warning("WAVLM: using seeded random init (no checkpoint found)")
    return random_wavlm(cfg, dtype=dtype)


def default_embedder(model_dir: Optional[str] = "models/wavlm-base-plus-sv"):
    """Return a callable audio (N,) float32 → (512,) embedding, with the
    forward pass jitted once (static audio bucketing to limit recompiles)."""
    cfg = BASE_PLUS_SV
    params = load_or_init_wavlm(model_dir, cfg)

    @partial(jax.jit, static_argnames=())
    def fwd(p, audio):
        return xvector_embed(p, audio[None], cfg)[0]

    def embed(audio: np.ndarray) -> np.ndarray:
        # bucket length to powers of two seconds to bound compile count
        n = audio.shape[0]
        bucket = 16000
        while bucket < n:
            bucket *= 2
        padded = np.zeros(bucket, np.float32)
        padded[:n] = audio
        return np.asarray(fwd(params, jnp.asarray(padded)))

    return embed
