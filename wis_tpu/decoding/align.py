"""Word-level timestamps: cross-attention alignment + DTW.

CTranslate2 (the reference's ASR engine) carries a word-alignment
capability the reference server never exposes (reference main.py:687-693
calls `generate` without `return_attention`); this module adds it as a
first-class feature: ``/api/asr?word_timestamps=true`` returns per-word
start/end times and probabilities.

Design (TPU-first):
- ONE extra jitted teacher-forced pass over the final token sequence
  (batch 1, the chosen beam). Cross-attention weights of the alignment
  heads are normalized per head (mean/std over the token axis), median-
  filtered over the frame axis, and SUMMED across heads inside the
  layer scan — the carry holds only a (T, S) f32 accumulator, never the
  (L, H, T, S) weight tensor (~600 MB on large-v2).
- The (T, S) alignment matrix is fetched once (~0.7 MB) and the DTW +
  word grouping run on host (O(T·S) trivial numpy).

Alignment heads: OpenAI ships per-model head masks as opaque blobs; when
a ``alignment_heads.json`` file is present next to the checkpoint it is
used, otherwise the standard heuristic applies (all heads of the upper
half of decoder layers — the published masks overwhelmingly select from
these layers).
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wis_tpu.models.whisper.config import WhisperConfig
from wis_tpu.models.whisper.model import _linear, _mlp, layer_norm
from wis_tpu.ops.attention import qkv_heads
from wis_tpu.models.whisper.tokenizer import EOT, WhisperTokenizer

FRAME_S = 0.02  # one encoder position = 20 ms of audio
MEDFILT = 7


def default_alignment_heads(cfg: WhisperConfig) -> np.ndarray:
    """(L, H) 0/1 mask — all heads of the upper half of decoder layers."""
    m = np.zeros((cfg.n_text_layer, cfg.n_text_head), np.float32)
    m[cfg.n_text_layer // 2 :] = 1.0
    return m


def load_alignment_heads(cfg: WhisperConfig, model_dir: Optional[str]) -> np.ndarray:
    """Checkpoint-provided head list (``alignment_heads.json``: list of
    [layer, head] pairs) or the default heuristic."""
    if model_dir:
        path = os.path.join(model_dir, "alignment_heads.json")
        if os.path.exists(path):
            pairs = json.loads(open(path).read())
            m = np.zeros((cfg.n_text_layer, cfg.n_text_head), np.float32)
            for l, h in pairs:
                m[int(l), int(h)] = 1.0
            if m.sum():
                return m
    return default_alignment_heads(cfg)


def build_align_program(cfg: WhisperConfig, *, seq_len: int, heads: np.ndarray):
    """Jitted (params, xa_kv, tokens (1, seq_len) i32, n_text () i32)
    → (matrix (seq_len, S) f32, probs (seq_len,) f32).

    matrix[t, s]: head-summed normalized cross-attention of token t on
    audio frame s (positions ≥ n_text zeroed). probs[t]: model
    probability of tokens[t+1] given the prefix (teacher-forced).
    """
    H = cfg.n_text_head
    Dh = cfg.n_text_state // H
    S = cfg.n_audio_ctx
    scale = Dh**-0.5
    hsel = jnp.asarray(heads, jnp.float32)  # (L, H)
    n_sel = max(float(heads.sum()), 1.0)

    on_tpu = jax.default_backend() not in ("cpu",)

    def _dot(eq, a, b):
        if on_tpu:
            return jnp.einsum(eq, a, b, preferred_element_type=jnp.float32)
        return jnp.einsum(eq, a.astype(jnp.float32), b.astype(jnp.float32))

    @jax.jit
    def align(params, xa_kv, tokens, n_text):
        dec = params["decoder"]
        dtype = dec["tok_emb"].dtype
        x = jnp.take(dec["tok_emb"], tokens[0], axis=0).astype(dtype)
        x = x + dec["pos"][:seq_len].astype(dtype)
        x = x[None]  # (1, T, D)

        tok_mask = (jnp.arange(seq_len) < n_text).astype(jnp.float32)
        causal = (
            jnp.arange(seq_len)[None, :] <= jnp.arange(seq_len)[:, None]
        )[None, None]

        xa_k, xa_v = xa_kv  # (L, 1, H, Dh, S)

        def block(carry, scanned):
            x, acc = carry
            blk, xk, xv, sel_l = scanned
            h = layer_norm(x, blk["attn_ln"]["g"], blk["attn_ln"]["b"])
            q = qkv_heads(_linear(h, blk["attn"]["q_w"], blk["attn"]["q_b"]), H)
            k = qkv_heads(_linear(h, blk["attn"]["k_w"]), H)
            v = qkv_heads(_linear(h, blk["attn"]["v_w"], blk["attn"]["v_b"]), H)
            scores = _dot("bhtd,bhsd->bhts", q, k) * scale
            scores = jnp.where(causal, scores, -1e30)
            w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
            attn = jnp.einsum("bhts,bhsd->bhtd", w, v)
            attn = attn.swapaxes(1, 2).reshape(1, seq_len, H * Dh)
            x = x + _linear(attn, blk["attn"]["o_w"], blk["attn"]["o_b"])

            h = layer_norm(x, blk["cross_ln"]["g"], blk["cross_ln"]["b"])
            qc = qkv_heads(_linear(h, blk["cross"]["q_w"], blk["cross"]["q_b"]), H)
            cs = _dot("bhtd,bhds->bhts", qc, xk[0][None]) * scale
            cw32 = jax.nn.softmax(cs, axis=-1)  # (1, H, T, S) f32
            ctx = jnp.einsum(
                "bhts,bhds->bhtd", cw32.astype(xv.dtype), xv[0][None]
            )
            ctx = ctx.swapaxes(1, 2).reshape(1, seq_len, H * Dh)
            x = x + _linear(ctx, blk["cross"]["o_w"], blk["cross"]["o_b"])

            x = x + _mlp(
                layer_norm(x, blk["mlp_ln"]["g"], blk["mlp_ln"]["b"]),
                blk["mlp"],
            )

            # per-head normalization over the VALID token axis, median
            # filter over frames, head-masked sum into the accumulator
            wsel = cw32[0] * tok_mask[None, :, None]  # (H, T, S)
            cnt = jnp.maximum(n_text.astype(jnp.float32), 1.0)
            mean = jnp.sum(wsel, axis=1, keepdims=True) / cnt
            var = jnp.sum(
                (wsel - mean) ** 2 * tok_mask[None, :, None], axis=1,
                keepdims=True,
            ) / cnt
            norm = (wsel - mean) * jax.lax.rsqrt(var + 1e-8)
            # width-7 median over the frame axis (edge-clamped window)
            widx = jnp.clip(
                jnp.arange(S)[None, :]
                + jnp.arange(-(MEDFILT // 2), MEDFILT // 2 + 1)[:, None],
                0, S - 1,
            )  # (MEDFILT, S)
            med = jnp.median(norm[:, :, widx], axis=2)  # (H, T, S)
            acc = acc + jnp.einsum("h,hts->ts", sel_l, med)
            return (x, acc), None

        acc0 = jnp.zeros((seq_len, S), jnp.float32)
        (x, acc), _ = jax.lax.scan(
            block, (x, acc0),
            (dec["blocks"], xa_k, xa_v, hsel),
        )
        x = layer_norm(x, dec["ln"]["g"], dec["ln"]["b"])
        logits = jnp.einsum(
            "btd,vd->btv", x, dec["tok_emb"].astype(x.dtype),
            preferred_element_type=jnp.float32,
        )[0]
        lp = jax.nn.log_softmax(logits, axis=-1)
        nxt = jnp.concatenate([tokens[0, 1:], tokens[0, -1:]])
        probs = jnp.exp(
            jnp.take_along_axis(lp, nxt[:, None], axis=1)[:, 0]
        )
        matrix = acc * tok_mask[:, None] / n_sel
        return matrix, probs

    return align


def build_align_from_audio(cfg: WhisperConfig, *, seq_len: int, heads: np.ndarray):
    """Self-contained one-dispatch variant: (params, audio_i16
    (1, N_SAMPLES) i16, tokens (1, seq_len) i32, n_text () i32) →
    (matrix, probs). Recomputes mel+encoder (the main request program
    keeps xa_kv internal — an extra encode is one dispatch and avoids
    holding every request's cross-KV alive for a maybe-alignment)."""
    from wis_tpu.audio.mel import _log_mel_jax
    from wis_tpu.models.whisper.model import cross_kv, encode

    inner = build_align_program(cfg, seq_len=seq_len, heads=heads)

    @jax.jit
    def align(params, audio_i16, tokens, n_text):
        audio = audio_i16.astype(jnp.float32) / 32768.0
        mel = _log_mel_jax(audio, n_mels=cfg.n_mels)
        xa = encode(params, mel, cfg)
        xa_kv = cross_kv(params, xa, cfg)
        return inner(params, xa_kv, tokens, n_text)

    return align


# --------------------------------------------------------------------- #
# Host-side: DTW + word grouping
# --------------------------------------------------------------------- #
def dtw_path(matrix: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Monotonic alignment path maximizing summed attention (classic DTW
    on -matrix with steps diag/down/right). Returns (text_idx, time_idx)."""
    T, S = matrix.shape
    cost = -matrix.astype(np.float64)
    D = np.full((T + 1, S + 1), np.inf)
    D[0, 0] = 0.0
    trace = np.zeros((T + 1, S + 1), np.int8)
    for i in range(1, T + 1):
        row_prev = D[i - 1]
        row = D[i]
        c = cost[i - 1]
        for j in range(1, S + 1):
            c0 = row_prev[j - 1]  # diag
            c1 = row_prev[j]      # down (next token, same frame)
            c2 = row[j - 1]       # right (same token, next frame)
            best = c0
            t = 0
            if c1 < best:
                best, t = c1, 1
            if c2 < best:
                best, t = c2, 2
            row[j] = c[j - 1] + best
            trace[i, j] = t
    i, j = T, S
    ti, si = [], []
    while i > 0 and j > 0:
        ti.append(i - 1)
        si.append(j - 1)
        t = trace[i, j]
        if t == 0:
            i, j = i - 1, j - 1
        elif t == 1:
            i -= 1
        else:
            j -= 1
    return np.array(ti[::-1]), np.array(si[::-1])


_NO_SPACE_LANGS = {"zh", "ja", "th", "lo", "my", "yue"}


def split_word_tokens(
    tokenizer: WhisperTokenizer, ids: Sequence[int], language: str = "en"
) -> List[List[int]]:
    """Group text-token ids into word groups. Space-delimited languages
    split on the GPT-2 space marker; no-space languages split per token."""
    groups: List[List[int]] = []
    if language in _NO_SPACE_LANGS:
        return [[int(i)] for i in ids if int(i) < EOT]
    for i in ids:
        i = int(i)
        if i >= EOT:
            continue
        s = tokenizer._token_str(i)
        if not groups or s.startswith("Ġ"):
            groups.append([i])
        else:
            groups[-1].append(i)
    return groups


def words_from_alignment(
    tokenizer: WhisperTokenizer,
    token_ids: Sequence[int],  # generated tokens (no prompt), specials ok
    matrix: np.ndarray,  # (seq_len, S) from the align program
    probs: np.ndarray,  # (seq_len,) teacher-forced next-token probs
    prompt_len: int,
    n_frames: int,  # actual audio frames (duration / 20 ms)
    language: str = "en",
    time_offset: float = 0.0,
) -> List[dict]:
    """→ [{"word", "start", "end", "probability"}] (reference-style dicts;
    CT2's `word_timestamps=True` shape)."""
    text_ids = [int(t) for t in token_ids if int(t) < EOT]
    if not text_ids:
        return []
    # rows of `matrix` covering the generated text tokens
    rows = []
    pos = prompt_len
    row_of_tok = {}
    for t in token_ids:
        t = int(t)
        if t == EOT:
            break
        if t < EOT:
            row_of_tok[len(rows)] = pos
            rows.append(pos)
        pos += 1
    if not rows:
        return []
    sub = matrix[rows][:, : max(n_frames, 2)]
    ti, si = dtw_path(sub)
    # first/last frame of each token row on the path
    starts = np.zeros(len(rows), np.int64)
    ends = np.zeros(len(rows), np.int64)
    seen = set()
    for r, f in zip(ti, si):
        if r not in seen:
            starts[r] = f
            seen.add(r)
        ends[r] = f
    # token probability: probs[pos-1] predicts the token at pos
    tok_prob = {
        k: float(probs[v - 1]) if v >= 1 else 0.0 for k, v in row_of_tok.items()
    }
    words = []
    k = 0
    for group in split_word_tokens(tokenizer, text_ids, language):
        idxs = list(range(k, k + len(group)))
        k += len(group)
        if not idxs:
            continue
        word = tokenizer.decode(group)
        p = float(np.mean([tok_prob.get(i, 0.0) for i in idxs]))
        words.append(
            {
                "word": word,
                "start": round(time_offset + starts[idxs[0]] * FRAME_S, 2),
                "end": round(time_offset + (ends[idxs[-1]] + 1) * FRAME_S, 2),
                "probability": round(p, 4),
            }
        )
    return words
