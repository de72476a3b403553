"""Whisper encoder-decoder as a pure-functional JAX program.

This replaces the reference's CTranslate2 C++/CUDA Whisper engine
(reference main.py:341-443: `ctranslate2.models.Whisper`, `.generate`,
`.detect_language`) with a TPU-first design:

- **Stacked layers + lax.scan**: all transformer blocks of a model are
  stored as stacked arrays with a leading layer axis and executed with
  `lax.scan`, so a 32-layer large-v2 compiles as one rolled loop (fast
  XLA compiles, identical runtime — weights stream from HBM either way).
- **Static shapes**: mel input is always (B, 80, 3000); the decoder runs
  a prefill over the fixed prompt followed by single-token steps against
  a preallocated KV cache, so each (model, beam, batch-bucket) pair
  compiles exactly once (see wis_tpu.runtime.engine).
- **Cross-attention K/V are precomputed** once per request after the
  encoder and reused by every decode step and by the translate-task
  second pass (the analog of the reference reusing resident
  `gpu_features`, main.py:727-748).
- dtypes: weights/activations bf16, attention logits and output logits
  f32.

Param pytree layout (per model; `weights.py` constructs it):

    params["encoder"] = {
        "conv1": {"w": (3, n_mels, D), "b": (D,)},
        "conv2": {"w": (3, D, D), "b": (D,)},
        "pos":   (1500, D),                      # sinusoidal
        "blocks": {  # every leaf has leading layer axis L
            "attn_ln": {"g": (L,D), "b": (L,D)},
            "attn": {"q_w": (L,D,D), "q_b": (L,D), "k_w": (L,D,D),
                      "v_w": (L,D,D), "v_b": (L,D),
                      "o_w": (L,D,D), "o_b": (L,D)},
            "mlp_ln": {"g": (L,D), "b": (L,D)},
            "mlp": {"w1": (L,D,4D), "b1": (L,4D), "w2": (L,4D,D), "b2": (L,D)},
        },
        "ln_post": {"g": (D,), "b": (D,)},
    }
    params["decoder"] = same shape plus "cross" (q/k/v/o) and
        "cross_ln" per block, "tok_emb": (V, D), "pos": (448, D),
        "ln": {"g","b"}.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from wis_tpu.models.whisper.config import WhisperConfig
from wis_tpu.ops.attention import merge_heads, mha, qkv_heads


def layer_norm(x: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    return (out * g + b).astype(x.dtype)


def _linear(x, w, b=None):
    from wis_tpu.ops.quant import qmatmul

    y = qmatmul(x, w)
    if b is not None:
        y = (y.astype(jnp.float32) + b).astype(x.dtype)
    return y


def _attn_block(x, blk, layer, n_heads, mask=None, kv=None):
    """Self- or cross-attention for one (scanned) layer.

    kv: None → self-attention over x; (k, v) → use precomputed heads.
    Long unmasked sequences (the 1500-position encoder) route to the
    Pallas flash-attention kernel on TPU — scores stay in VMEM instead of
    materializing (H, T, T) f32 tensors in HBM.
    """
    import os

    d_model = x.shape[-1]
    flash_ok = (
        mask is None
        and kv is None
        and x.shape[-2] >= 512
        and jax.default_backend() not in ("cpu",)
        and not os.environ.get("WIS_NO_FLASH")
    )
    if (
        flash_ok
        and d_model // n_heads in (64, 128)
        and not os.environ.get("WIS_NO_PACKED_FLASH")
    ):
        # packed-layout kernel: q/k/v stay (B, T, D) end to end — the
        # (B, H, T, Dh) head transposes otherwise move ~4·B·T·D bytes
        # per layer through HBM (≈ 7.7 GB per large-v2 encoder pass,
        # most of the attention block's measured cost)
        from wis_tpu.ops.flash import flash_attention_packed

        qp = _linear(x, blk["q_w"], blk["q_b"])
        kp = _linear(x, blk["k_w"])
        vp = _linear(x, blk["v_w"], blk["v_b"])
        out = flash_attention_packed(qp, kp, vp, n_heads)
        return _linear(out, blk["o_w"], blk["o_b"])

    q = qkv_heads(_linear(x, blk["q_w"], blk["q_b"]), n_heads)
    if kv is None:
        k = qkv_heads(_linear(x, blk["k_w"]), n_heads)
        v = qkv_heads(_linear(x, blk["v_w"], blk["v_b"]), n_heads)
    else:
        k, v = kv
    use_flash = flash_ok and q.shape[-1] % 8 == 0
    if use_flash:
        from wis_tpu.ops.flash import flash_attention

        out = merge_heads(flash_attention(q, k, v))
    else:
        out = merge_heads(mha(q, k, v, mask))
    return _linear(out, blk["o_w"], blk["o_b"])


def _mlp(x, blk):
    # tanh-form near-exact gelu (ops/gelu.py): max |err| 1.3e-5 vs erf —
    # 150× inside the HF-parity tolerance, ~2 ms cheaper per large-v2
    # encoder pass than XLA's erf lowering (probe_encoder_variants)
    from wis_tpu.ops.gelu import gelu

    h = gelu(_linear(x, blk["w1"], blk["b1"]))
    return _linear(h, blk["w2"], blk["b2"])


# --------------------------------------------------------------------------- #
# Encoder
# --------------------------------------------------------------------------- #
def _conv1d(x, w, b, stride):
    """x (B, T, C_in), w (K, C_in, C_out), 'same' padding."""
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(1, 1)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )
    return (y + b).astype(x.dtype)


def _enc_ln(x, g, b):
    """Encoder LayerNorm: the single-pass Pallas kernel on TPU (bf16
    in/out, f32 statistics — ops/layernorm.py), XLA elsewhere. 65
    instances per large-v2 pass cost ≈3.4 ms through XLA
    (probe_encoder_variants noln ablation)."""
    import os

    if (
        x.shape[-1] % 128 == 0
        and jax.default_backend() not in ("cpu",)
        and not os.environ.get("WIS_NO_LN_KERNEL")
    ):
        from wis_tpu.ops.layernorm import layer_norm_pallas

        return layer_norm_pallas(x, g, b)
    return layer_norm(x, g, b)


def encode(params: dict, mel: jnp.ndarray, cfg: WhisperConfig) -> jnp.ndarray:
    """mel (B, n_mels, 3000) → encoder states (B, 1500, D).

    The conv stem runs as im2col-by-reshape matmuls (stem.py) — the
    lax.conv lowering measured 0.69 vs 0.39 ms (probe_stem_ln.py)."""
    from wis_tpu.models.whisper.stem import conv_stem

    enc = params["encoder"]
    x = conv_stem(enc, mel)

    def block(x, blk):
        x = x + _attn_block(
            _enc_ln(x, blk["attn_ln"]["g"], blk["attn_ln"]["b"]),
            blk["attn"],
            None,
            cfg.n_audio_head,
        )
        x = x + _mlp(_enc_ln(x, blk["mlp_ln"]["g"], blk["mlp_ln"]["b"]), blk["mlp"])
        return x, None

    import os

    unroll = int(os.environ.get("WIS_ENC_UNROLL", "1"))
    x, _ = jax.lax.scan(block, x, enc["blocks"], unroll=unroll)
    return _enc_ln(x, enc["ln_post"]["g"], enc["ln_post"]["b"])


def cross_kv(params: dict, xa: jnp.ndarray, cfg: WhisperConfig):
    """Precompute per-layer cross-attention K/V from encoder states.

    xa (B, 1500, D) → (k, v) each (L, B, H, Dh, 1500) — **time-minor
    layout**: head_dim (64) in the TPU lane position would pad to 128 and
    double the HBM traffic of the per-step cross-KV stream; with time
    minor the pad is 1500→1536 (2%).
    """
    dec = params["decoder"]

    def per_layer(_, blk):
        k = qkv_heads(_linear(xa, blk["cross"]["k_w"]), cfg.n_text_head)
        v = qkv_heads(
            _linear(xa, blk["cross"]["v_w"], blk["cross"]["v_b"]), cfg.n_text_head
        )
        return None, (k.swapaxes(-1, -2), v.swapaxes(-1, -2))

    _, (k, v) = jax.lax.scan(per_layer, None, dec["blocks"])
    return k, v


# --------------------------------------------------------------------------- #
# Decoder
# --------------------------------------------------------------------------- #
class DecoderCache(NamedTuple):
    """Preallocated self-attention KV cache.

    k, v: (L, B, H, Dh, T_max) — time-minor so the head_dim (64) never
    sits in the 128-wide lane position (which would pad every cache read
    2×); pos: () int32 — number of valid positions.
    """

    k: jnp.ndarray
    v: jnp.ndarray
    pos: jnp.ndarray

    @classmethod
    def zeros(
        cls, cfg: WhisperConfig, batch: int, max_len: int, dtype=jnp.bfloat16
    ) -> "DecoderCache":
        shape = (
            cfg.n_text_layer,
            batch,
            cfg.n_text_head,
            cfg.n_text_state // cfg.n_text_head,
            max_len,
        )
        return cls(
            jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), jnp.zeros((), jnp.int32)
        )

    def reorder(self, beam_idx: jnp.ndarray) -> "DecoderCache":
        """Gather cache rows along the batch axis (beam-search reorder)."""
        return DecoderCache(
            jnp.take(self.k, beam_idx, axis=1),
            jnp.take(self.v, beam_idx, axis=1),
            self.pos,
        )


def _decoder_pass(
    params: dict,
    tokens: jnp.ndarray,  # (B, T) int32
    pos_offset: jnp.ndarray,  # () int32 — first token's absolute position
    cache: DecoderCache,
    xa_kv: Tuple[jnp.ndarray, jnp.ndarray],
    cfg: WhisperConfig,
    anc: jnp.ndarray = None,  # (Bq, K, T_max) int32 ancestry, or None
) -> Tuple[jnp.ndarray, DecoderCache]:
    """Shared prefill/step body: run T tokens through the decoder, writing
    self-attn K/V into the cache at [pos_offset, pos_offset+T).

    Structure chosen for the decode hot loop:
    - layers run under `lax.scan` with the **whole cache in the carry**
      and the per-layer slice updated in place via dynamic_update_slice —
      no per-step reallocation/write of the full cache (a scan-ys cache
      would rewrite all L·B·H·Dh·T bytes every token);
    - K/V live time-minor (see DecoderCache) so per-step attention reads
      stream at full lane width;
    - all beams of a sequence share the encoder K/V via grouped einsum
      (saves beam_size× cross-KV HBM traffic, the dominant per-step cost
      after weights).
    """
    dec = params["decoder"]
    b, t = tokens.shape
    max_len = cache.k.shape[4]
    dtype = cache.k.dtype

    x = jnp.take(dec["tok_emb"], tokens, axis=0).astype(dtype)
    pos_ids = pos_offset + jnp.arange(t)
    x = x + jnp.take(dec["pos"], pos_ids, axis=0).astype(dtype)

    # attend to absolute positions <= own absolute position
    key_pos = jnp.arange(max_len)[None, :]  # (1, T_max)
    query_pos = pos_ids[:, None]  # (T, 1)
    mask = (key_pos <= query_pos)[None, None]  # (1, 1, T, T_max)

    xa_k, xa_v = xa_kv  # (L, Bx, H, Dh, S)
    group = b // xa_k.shape[1]
    scale = (cfg.n_text_state // cfg.n_text_head) ** -0.5

    # TPU MXU accumulates bf16 operands in f32 via preferred_element_type;
    # the CPU backend lacks that thunk for these contractions, so upcast
    # there (tests run on CPU; production runs on TPU).
    on_tpu = jax.default_backend() not in ("cpu",)

    def _score_dot(eq, a, b_):
        if on_tpu:
            return jnp.einsum(eq, a, b_, preferred_element_type=jnp.float32)
        return jnp.einsum(eq, a.astype(jnp.float32), b_.astype(jnp.float32))

    def _self_attn(q, ck, cv):
        # q (B,H,T,Dh); ck/cv (B,H,Dh,T_max) time-minor
        scores = _score_dot("bhtd,bhds->bhts", q, ck) * scale
        scores = jnp.where(mask, scores, -1e30)
        w = jax.nn.softmax(scores, axis=-1).astype(cv.dtype)
        return jnp.einsum("bhts,bhds->bhtd", w, cv)

    # Ancestry-indirect beam attention (single-token decode only): the
    # beam-search caller never physically permutes the cache on beam
    # reorders (a full out-of-place copy, ~1.7 ms/step on large-v2 —
    # BENCH.md); instead each beam always writes its own physical row
    # and `anc[b, k, s]` names the physical row holding logical beam k's
    # history at position s (-1 = unwritten). Attention scores are
    # computed against ALL K physical rows (K× more MACs on tiny
    # matmuls — still HBM-bound on the same cache bytes) and the
    # selection mask picks each position's true row.
    if anc is not None:
        k_beams = anc.shape[1]
        bq = anc.shape[0]
        # sel[b, k, p, s] = 1 where physical row p holds (b, k)'s history
        # at position s; anc == -1 rows select nothing (masked position).
        sel = jax.nn.one_hot(anc, k_beams, dtype=jnp.bool_)  # (Bq,K,T,K)
        sel = sel.swapaxes(-1, -2)  # (Bq, K, K, T)

    def _self_attn_anc(q, ck, cv):
        # q (BK,H,1,Dh); ck/cv (BK,H,Dh,T_max) — rows grouped (Bq, K)
        qk = q.reshape(bq, k_beams, n_head, dh)
        ckk = ck.reshape(bq, k_beams, *ck.shape[1:])
        cvv = cv.reshape(bq, k_beams, *cv.shape[1:])
        scores = _score_dot("bkhd,bphds->bkhps", qk, ckk) * scale
        scores = jnp.where(sel[:, :, None, :, :], scores, -1e30)
        w = jax.nn.softmax(
            scores.reshape(bq, k_beams, n_head, -1), axis=-1
        ).reshape(scores.shape).astype(cv.dtype)
        out = jnp.einsum("bkhps,bphds->bkhd", w, cvv)
        return out.reshape(b, n_head, 1, dh)

    def _cross_attn(q, xk, xv):
        # q (B,H,T,Dh) → grouped (Bx,G,H,T,Dh); xk/xv (Bx,H,Dh,S)
        qg = q.reshape(q.shape[0] // group, group, *q.shape[1:])
        scores = _score_dot("bghtd,bhds->bghts", qg, xk) * scale
        w = jax.nn.softmax(scores, axis=-1).astype(xv.dtype)
        ctx = jnp.einsum("bghts,bhds->bghtd", w, xv)
        return ctx.reshape(q.shape)

    n_head = cfg.n_text_head
    dh = cfg.n_text_state // n_head

    # Single-token decode (t == 1) is the hot loop: with a singleton time
    # axis, head split/merge and the time-minor cache write are pure
    # reshapes (identical element order) — ~200 small transpose ops per
    # step otherwise. Prefill (t > 1) takes the general path.
    def split_heads(y):  # (B, t, D) → (B, H, t, Dh)
        if t == 1:
            return y.reshape(b, n_head, 1, dh)
        return qkv_heads(y, n_head)

    def unsplit_heads(y):  # (B, H, t, Dh) → (B, t, D)
        if t == 1:
            return y.reshape(b, 1, n_head * dh)
        return merge_heads(y)

    def to_time_minor(y):  # (B, H, t, Dh) → (B, H, Dh, t)
        if t == 1:
            return y.reshape(b, n_head, dh, 1)
        return y.swapaxes(-1, -2)

    def block(carry, scanned):
        x, k_all, v_all = carry
        blk, xk, xv, li = scanned
        h = layer_norm(x, blk["attn_ln"]["g"], blk["attn_ln"]["b"])
        q = split_heads(_linear(h, blk["attn"]["q_w"], blk["attn"]["q_b"]))
        k_new = split_heads(_linear(h, blk["attn"]["k_w"]))
        v_new = split_heads(
            _linear(h, blk["attn"]["v_w"], blk["attn"]["v_b"])
        )
        # in-place column write at [li, :, :, :, pos_offset:pos_offset+t)
        k_all = jax.lax.dynamic_update_slice(
            k_all, to_time_minor(k_new).astype(dtype)[None], (li, 0, 0, 0, pos_offset)
        )
        v_all = jax.lax.dynamic_update_slice(
            v_all, to_time_minor(v_new).astype(dtype)[None], (li, 0, 0, 0, pos_offset)
        )
        ck = jax.lax.dynamic_index_in_dim(k_all, li, 0, keepdims=False)
        cv = jax.lax.dynamic_index_in_dim(v_all, li, 0, keepdims=False)
        attn_fn = _self_attn_anc if anc is not None else _self_attn
        x = x + _linear(
            unsplit_heads(attn_fn(q, ck, cv)), blk["attn"]["o_w"], blk["attn"]["o_b"]
        )
        h = layer_norm(x, blk["cross_ln"]["g"], blk["cross_ln"]["b"])
        qc = split_heads(
            _linear(h, blk["cross"]["q_w"], blk["cross"]["q_b"])
        )
        x = x + _linear(
            unsplit_heads(_cross_attn(qc, xk, xv)),
            blk["cross"]["o_w"],
            blk["cross"]["o_b"],
        )
        x = x + _mlp(layer_norm(x, blk["mlp_ln"]["g"], blk["mlp_ln"]["b"]), blk["mlp"])
        return (x, k_all, v_all), None

    (x, new_k, new_v), _ = jax.lax.scan(
        block,
        (x, cache.k, cache.v),
        (dec["blocks"], xa_k, xa_v, jnp.arange(cfg.n_text_layer)),
    )
    x = layer_norm(x, dec["ln"]["g"], dec["ln"]["b"])
    if "tok_emb_q" in dec:
        # per-row int8 logits matmul (ops/quant.quantize_rows): the dot
        # runs on the int8 rows (exact in bf16 — int8 fits the mantissa)
        # and each vocab row's scale applies AFTER the contraction; the
        # fused head (ops/fused_logits emb_int8) does the identical math
        eq = dec["tok_emb_q"]
        logits = jnp.einsum(
            "btd,vd->btv", x, eq["q"].astype(x.dtype),
            preferred_element_type=jnp.float32,
        ) * eq["s"][:, 0][None, None, :]
    else:
        logits = jnp.einsum(
            "btd,vd->btv", x, dec["tok_emb"].astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
    new_cache = DecoderCache(new_k, new_v, pos_offset + t)
    return logits, new_cache


def prefill(
    params: dict,
    prompt: jnp.ndarray,  # (B, P)
    cache: DecoderCache,
    xa_kv,
    cfg: WhisperConfig,
) -> Tuple[jnp.ndarray, DecoderCache]:
    """Run the prompt through the decoder. Returns (logits (B, P, V) f32,
    cache)."""
    return _decoder_pass(params, prompt, jnp.int32(0), cache, xa_kv, cfg)


def decode_step(
    params: dict,
    tokens: jnp.ndarray,  # (B,) int32 — last sampled token per sequence
    cache: DecoderCache,
    xa_kv,
    cfg: WhisperConfig,
    anc: jnp.ndarray = None,  # optional (Bq, K, T_max) ancestry map
) -> Tuple[jnp.ndarray, DecoderCache]:
    """One autoregressive step. Returns (logits (B, V) f32, cache).

    With `anc`, self-attention resolves each logical beam's history
    through the ancestry map instead of assuming physically contiguous
    rows — the beam-search caller then never permutes the cache (see
    _decoder_pass)."""
    logits, cache = _decoder_pass(
        params, tokens[:, None], cache.pos, cache, xa_kv, cfg, anc=anc
    )
    return logits[:, 0], cache
