"""TPU bring-up for the fused decode-step kernel.

mode=micro : compile + run the micro test config on the real chip and
             check against the XLA mirror.
mode=time  : large-v2 beam-5 shapes, 16-step scan with the real per-step
             glue (logits matmul + top-k + sel/ancestry update), report
             ms/step.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wis_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from wis_tpu.models.whisper.config import WHISPER_CONFIGS, WhisperConfig
from wis_tpu.models.whisper.weights import random_params
from wis_tpu.ops.fused_decode import (
    build_fused_decode_step,
    fused_decode_step_reference,
    pack_decoder,
)
from wis_tpu.ops.quant import quantize_whisper_params


def micro():
    cfg = WhisperConfig(
        name="micro-fused-step",
        n_audio_state=128, n_audio_head=2, n_audio_layer=2,
        n_text_state=128, n_text_head=2, n_text_layer=2,
    )
    D, H, L = 128, 2, 2
    Dh = D // H
    BK, T, S = 2, 128, 128
    rng = np.random.default_rng(0)
    params = quantize_whisper_params(random_params(cfg, seed=0, dtype=jnp.bfloat16))
    packed = pack_decoder(params, cfg)
    x_emb = jnp.asarray(rng.standard_normal((BK, D)) * 0.3, jnp.float32)
    kc = jnp.asarray(rng.standard_normal((L, D, BK * T)) * 0.3, jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((L, D, BK * T)) * 0.3, jnp.bfloat16)
    xak = jnp.asarray(rng.standard_normal((L, H, Dh, S)) * 0.3, jnp.bfloat16)
    xav = jnp.asarray(rng.standard_normal((L, H, Dh, S)) * 0.3, jnp.bfloat16)
    sel = np.zeros((BK, T, BK), np.float32)  # time-major flat columns
    sel[:, :9] = np.eye(BK)[:, None, :]
    sel = jnp.asarray(sel.reshape(BK, BK * T))

    step = build_fused_decode_step(cfg, bk=BK, t_cache=T, s_audio=S)
    x_out, k_new, v_new = jax.jit(step)(
        packed, x_emb, kc, vc, xak, xav, sel, jnp.int32(9)
    )
    x_ref, k_ref, v_ref = fused_decode_step_reference(
        cfg, packed, x_emb, kc, vc, xak, xav, sel, pos=9
    )
    for name, a, b in (("x", x_out, x_ref), ("k", k_new, k_ref), ("v", v_new, v_ref)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        d = np.abs(a - b).max()
        print(f"micro {name}: max diff {d:.5f} (scale {np.abs(b).max():.2f})")
        assert d < 0.05, (name, d)
    print("micro OK")


def timeit(t_cache=128, steps=16, bk=5):
    cfg = WHISPER_CONFIGS["large-v2"]
    D = cfg.n_text_state
    H = cfg.n_text_head
    Dh = D // H
    L = cfg.n_text_layer
    S = 1500
    K = bk
    rng = np.random.default_rng(0)
    params = quantize_whisper_params(random_params(cfg, seed=0, dtype=jnp.bfloat16))
    packed = pack_decoder(params, cfg)
    dec_ln_g = params["decoder"]["ln"]["g"].astype(jnp.float32)
    dec_ln_b = params["decoder"]["ln"]["b"].astype(jnp.float32)
    emb = params["decoder"]["tok_emb"]
    pos_emb = params["decoder"]["pos"]

    kc = jnp.zeros((L, D, K * t_cache), jnp.bfloat16)
    vc = jnp.zeros((L, D, K * t_cache), jnp.bfloat16)
    s_pad = ((S + 127) // 128) * 128  # kernel wants tile-aligned xa
    xak = jnp.asarray(
        np.pad(rng.standard_normal((L, H, Dh, S)) * 0.1, [(0, 0)] * 3 + [(0, s_pad - S)]),
        jnp.bfloat16,
    )
    xav = jnp.asarray(
        np.pad(rng.standard_normal((L, H, Dh, S)) * 0.1, [(0, 0)] * 3 + [(0, s_pad - S)]),
        jnp.bfloat16,
    )

    step = build_fused_decode_step(cfg, bk=K, t_cache=t_cache, s_audio=S)

    @jax.jit
    def run(packed, kc, vc, xak, xav):
        anc0 = jnp.where(
            jnp.arange(t_cache)[None, :] < 4,
            jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[:, None], (K, t_cache)),
            -1,
        )
        tok0 = jnp.zeros((K,), jnp.int32)

        def body(carry, _):
            kc, vc, anc, tok, pos = carry
            x_emb = (
                jnp.take(emb, tok, axis=0).astype(jnp.float32)
                + pos_emb[pos].astype(jnp.float32)[None]
            )
            sel = jax.nn.one_hot(anc, K, dtype=jnp.float32).reshape(
                K, K * t_cache
            )
            x_out, kc, vc = step(packed, x_emb, kc, vc, xak, xav, sel, pos)
            xn = (
                (x_out - jnp.mean(x_out, -1, keepdims=True))
                * jax.lax.rsqrt(jnp.var(x_out, -1, keepdims=True) + 1e-5)
                * dec_ln_g + dec_ln_b
            )
            logits = jnp.einsum(
                "bd,vd->bv", xn.astype(jnp.bfloat16), emb,
                preferred_element_type=jnp.float32,
            )
            # beam bookkeeping analog: top-k + forced rotation parents
            cand_val, cand_tok = jax.lax.top_k(logits, K)
            lse = jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)
            parent = (jnp.arange(K, dtype=jnp.int32) + 1) % K
            anc = jax.lax.dynamic_update_index_in_dim(
                anc, jnp.arange(K, dtype=jnp.int32), pos, axis=1
            )
            anc = jnp.take(anc, parent, axis=0)
            tok = jnp.take(cand_tok[:, 0], parent, axis=0)
            return (kc, vc, anc, tok, pos + 1), cand_val[:, 0]

        (kc, vc, anc, tok, pos), vals = jax.lax.scan(
            body, (kc, vc, anc0, tok0, jnp.int32(4)), None, length=steps
        )
        return tok, vals[-1]

    t0 = time.perf_counter()
    out = np.asarray(run(packed, kc, vc, xak, xav)[0])
    print(f"compile+first: {time.perf_counter()-t0:.1f}s")
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        np.asarray(run(packed, kc, vc, xak, xav)[0])
        times.append((time.perf_counter() - t0) * 1000)
    med = sorted(times)[len(times) // 2]
    per = (med - 26.0) / steps
    print(
        f"fused step (T={t_cache}, K={bk}): {per:.2f} ms/step "
        f"({steps}-step scan, raw {['%.1f' % t for t in times]})"
    )


def parts(t_cache=128, steps=16, bk=5):
    """Bare-kernel scans (no beam glue) with DMA streams selectively
    disabled — attributes per-step time to weights / cache / cross-KV."""
    cfg = WHISPER_CONFIGS["large-v2"]
    D, H = cfg.n_text_state, cfg.n_text_head
    Dh = D // H
    L = cfg.n_text_layer
    S = 1500
    s_pad = 1536
    K = bk
    rng = np.random.default_rng(0)
    params = quantize_whisper_params(random_params(cfg, seed=0, dtype=jnp.bfloat16))
    packed = pack_decoder(params, cfg)
    kc = jnp.asarray(rng.standard_normal((L, D, K * t_cache)) * 0.1, jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((L, D, K * t_cache)) * 0.1, jnp.bfloat16)
    xak = jnp.asarray(rng.standard_normal((L, H, Dh, s_pad)) * 0.1, jnp.bfloat16)
    xav = jnp.asarray(rng.standard_normal((L, H, Dh, s_pad)) * 0.1, jnp.bfloat16)
    sel = np.zeros((K, t_cache, K), np.float32)  # time-major
    sel[:, :8] = np.eye(K)[:, None, :]
    sel = jnp.asarray(sel.reshape(K, K * t_cache))
    x0 = jnp.asarray(rng.standard_normal((K, D)) * 0.1, jnp.float32)

    for skip in [(), ("w",), ("cache",), ("xa",), ("w", "cache", "xa")]:
        step = build_fused_decode_step(
            cfg, bk=K, t_cache=t_cache, s_audio=S, _skip=skip
        )

        @jax.jit
        def run(packed, x0, kc, vc, xak, xav, sel):
            def body(carry, _):
                x, kc, vc, pos = carry
                x_out, kc, vc = step(packed, x, kc, vc, xak, xav, sel, pos)
                # renormalize so values stay finite across steps
                x_next = x_out * jax.lax.rsqrt(jnp.mean(x_out * x_out) + 1e-6)
                return (x_next, kc, vc, pos + 1), ()

            (x, kc, vc, _), _ = jax.lax.scan(
                body, (x0, kc, vc, jnp.int32(8)), None, length=steps
            )
            return x

        t0 = time.perf_counter()
        np.asarray(run(packed, x0, kc, vc, xak, xav, sel))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(6):
            t0 = time.perf_counter()
            np.asarray(run(packed, x0, kc, vc, xak, xav, sel))
            times.append((time.perf_counter() - t0) * 1000)
        med = sorted(times)[len(times) // 2]
        per = (med - 26.0) / steps
        print(
            f"bare kernel skip={skip or 'none'}: {per:.2f} ms/step "
            f"(compile {compile_s:.0f}s, raw {['%.0f' % t for t in times]})",
            flush=True,
        )


def glue(t_cache=128, steps=16, bk=5):
    """Adds the beam-glue components one at a time onto the bare-kernel
    scan (caches flow through the kernel's aliased outputs — there is no
    XLA-side cache op to measure anymore)."""
    cfg = WHISPER_CONFIGS["large-v2"]
    D, H = cfg.n_text_state, cfg.n_text_head
    Dh = D // H
    L = cfg.n_text_layer
    S = 1500
    s_pad = 1536
    K = bk
    rng = np.random.default_rng(0)
    params = quantize_whisper_params(random_params(cfg, seed=0, dtype=jnp.bfloat16))
    packed = pack_decoder(params, cfg)
    emb = params["decoder"]["tok_emb"]
    pos_emb = params["decoder"]["pos"]
    dec_ln_g = params["decoder"]["ln"]["g"].astype(jnp.float32)
    dec_ln_b = params["decoder"]["ln"]["b"].astype(jnp.float32)
    kc0 = jnp.zeros((L, D, K * t_cache), jnp.bfloat16)
    vc0 = jnp.zeros((L, D, K * t_cache), jnp.bfloat16)
    xak = jnp.asarray(rng.standard_normal((L, H, Dh, s_pad)) * 0.1, jnp.bfloat16)
    xav = jnp.asarray(rng.standard_normal((L, H, Dh, s_pad)) * 0.1, jnp.bfloat16)
    sel0 = np.zeros((K, t_cache, K), np.float32)  # time-major
    sel0[:, :8] = np.eye(K)[:, None, :]
    sel0 = jnp.asarray(sel0.reshape(K, K * t_cache))
    x0 = jnp.asarray(rng.standard_normal((K, D)) * 0.1, jnp.float32)
    step = build_fused_decode_step(cfg, bk=K, t_cache=t_cache, s_audio=S)
    from wis_tpu.ops.fused_logits import build_fused_logits_topk

    head = build_fused_logits_topk(cfg, bk=K, k=K)
    sup_vec = jnp.zeros((cfg.n_vocab,), jnp.float32)

    def make(selanc=False, embed=False, logits=False):
        @jax.jit
        def run(packed, x0, kc, vc, xak, xav, sel):
            def body(carry, _):
                x, kc, vc, anc, tok, pos = carry
                if selanc:
                    sel_t = jax.nn.one_hot(anc, K, dtype=jnp.float32).reshape(
                        K, K * t_cache
                    )
                else:
                    sel_t = sel
                if embed:
                    x_in = (
                        jnp.take(emb, tok, axis=0).astype(jnp.float32)
                        + pos_emb[pos].astype(jnp.float32)[None]
                    )
                else:
                    x_in = x
                x_out, kc, vc = step(
                    packed, x_in, kc, vc, xak, xav, sel_t, pos
                )
                if logits == "fused":
                    cand_val, cand_tok, lse = head(
                        x_out, dec_ln_g, dec_ln_b, emb, sup_vec
                    )
                    tok = cand_tok[:, 0] + (lse[0, 0] * 0).astype(jnp.int32)
                    x = x_out + cand_val[0, 0] * 1e-9
                elif logits:
                    xn = x_out * jax.lax.rsqrt(
                        jnp.mean(x_out * x_out, -1, keepdims=True) + 1e-6
                    )
                    lg = jnp.einsum(
                        "bd,vd->bv", xn.astype(jnp.bfloat16), emb,
                        preferred_element_type=jnp.float32,
                    )
                    cand_val, cand_tok = jax.lax.top_k(lg, K)
                    lse = jax.scipy.special.logsumexp(lg, axis=-1, keepdims=True)
                    tok = cand_tok[:, 0] + (lse[0, 0] * 0).astype(jnp.int32)
                    x = x_out + cand_val[0, 0] * 1e-9
                else:
                    x = x_out * jax.lax.rsqrt(jnp.mean(x_out * x_out) + 1e-6)
                parent = (jnp.arange(K, dtype=jnp.int32) + 1) % K
                if selanc:
                    anc = jax.lax.dynamic_update_index_in_dim(
                        anc, jnp.arange(K, dtype=jnp.int32), pos, axis=1
                    )
                    anc = jnp.take(anc, parent, axis=0)
                return (x, kc, vc, anc, tok, pos + 1), ()

            anc0 = jnp.where(
                jnp.arange(t_cache)[None, :] < 8,
                jnp.broadcast_to(
                    jnp.arange(K, dtype=jnp.int32)[:, None], (K, t_cache)
                ),
                -1,
            )
            tok0 = jnp.zeros((K,), jnp.int32)
            carry, _ = jax.lax.scan(
                body, (x0, kc, vc, anc0, tok0, jnp.int32(8)), None, length=steps
            )
            return carry[0], carry[5]

        return run

    variants = [
        ("bare(writeback)", {}),
        ("+selanc", dict(selanc=True)),
        ("+embed", dict(selanc=True, embed=True)),
        ("+logits(all)", dict(selanc=True, embed=True, logits=True)),
        ("+fusedhead(all)", dict(selanc=True, embed=True, logits="fused")),
    ]
    for name, kwargs in variants:
        run = make(**kwargs)
        t0 = time.perf_counter()
        np.asarray(run(packed, x0, kc0, vc0, xak, xav, sel0)[0])
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(6):
            t0 = time.perf_counter()
            np.asarray(run(packed, x0, kc0, vc0, xak, xav, sel0)[0])
            times.append((time.perf_counter() - t0) * 1000)
        med = sorted(times)[len(times) // 2]
        per = (med - 26.0) / steps
        print(f"glue {name}: {per:.2f} ms/step (compile {compile_s:.0f}s)", flush=True)


def timeit_batch(n_seq=4, k=5, t_cache=128, steps=16):
    """Coalesced-batch fused step (block-diagonal cross-attn) with full
    production glue: sel-from-ancestry, embedding lookup, fused head."""
    cfg = WHISPER_CONFIGS["large-v2"]
    D, H = cfg.n_text_state, cfg.n_text_head
    Dh = D // H
    L = cfg.n_text_layer
    S = 1500
    s_pad = 1536
    BK = n_seq * k
    rng = np.random.default_rng(0)
    params = quantize_whisper_params(random_params(cfg, seed=0, dtype=jnp.bfloat16))
    packed = pack_decoder(params, cfg)
    emb = params["decoder"]["tok_emb"]
    pos_emb = params["decoder"]["pos"]
    dec_ln_g = params["decoder"]["ln"]["g"].astype(jnp.float32)
    dec_ln_b = params["decoder"]["ln"]["b"].astype(jnp.float32)
    kc0 = jnp.zeros((L, D, BK * t_cache), jnp.bfloat16)
    vc0 = jnp.zeros((L, D, BK * t_cache), jnp.bfloat16)
    xak = jnp.asarray(
        rng.standard_normal((L, H, Dh, n_seq * s_pad)) * 0.1, jnp.bfloat16
    )
    xav = jnp.asarray(
        rng.standard_normal((L, H, Dh, n_seq * s_pad)) * 0.1, jnp.bfloat16
    )
    x0 = jnp.asarray(rng.standard_normal((BK, D)) * 0.1, jnp.float32)
    step = build_fused_decode_step(
        cfg, bk=BK, t_cache=t_cache, s_audio=S, n_seq=n_seq
    )
    from wis_tpu.ops.fused_logits import build_fused_logits_topk

    head = build_fused_logits_topk(cfg, bk=BK, k=k)
    sup_vec = jnp.zeros((cfg.n_vocab,), jnp.float32)

    @jax.jit
    def run(packed, x0, kc, vc, xak, xav):
        anc0 = jnp.where(
            jnp.arange(t_cache)[None, None, :] < 8,
            jnp.broadcast_to(
                jnp.arange(k, dtype=jnp.int32)[None, :, None],
                (n_seq, k, t_cache),
            ),
            -1,
        )
        tok0 = jnp.zeros((BK,), jnp.int32)

        def body(carry, _):
            kc, vc, anc, tok, pos = carry
            boff = (jnp.arange(n_seq, dtype=jnp.int32) * k)[:, None, None]
            ganc = jnp.where(anc >= 0, anc + boff, -1)
            sel = jax.nn.one_hot(
                ganc.reshape(BK, t_cache), BK, dtype=jnp.float32
            ).reshape(BK, BK * t_cache)
            x_in = (
                jnp.take(emb, tok, axis=0).astype(jnp.float32)
                + pos_emb[pos].astype(jnp.float32)[None]
            )
            x_out, kc, vc = step(packed, x_in, kc, vc, xak, xav, sel, pos)
            cand_val, cand_tok, lse = head(
                x_out, dec_ln_g, dec_ln_b, emb, sup_vec
            )
            parent = (jnp.arange(k, dtype=jnp.int32) + 1) % k
            anc = jax.lax.dynamic_update_index_in_dim(
                anc,
                jnp.broadcast_to(
                    jnp.arange(k, dtype=jnp.int32)[None, :], (n_seq, k)
                ),
                pos, axis=2,
            )
            anc = jnp.take(anc, parent, axis=1)
            tok = (
                cand_tok[:, 0].reshape(n_seq, k)[:, parent].reshape(BK)
                + (lse[0, 0] * 0).astype(jnp.int32)
            )
            return (kc, vc, anc, tok, pos + 1), cand_val[:, 0]

        carry, vals = jax.lax.scan(
            body, (kc0, vc0, anc0, tok0, jnp.int32(8)), None, length=steps
        )
        return carry[3], vals[-1]

    t0 = time.perf_counter()
    np.asarray(run(packed, x0, kc0, vc0, xak, xav)[0])
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        np.asarray(run(packed, x0, kc0, vc0, xak, xav)[0])
        times.append((time.perf_counter() - t0) * 1000)
    med = sorted(times)[len(times) // 2]
    per = (med - 26.0) / steps
    print(
        f"fused batch step (n_seq={n_seq}, K={k}, T={t_cache}): "
        f"{per:.2f} ms/step ({steps}-step scan, "
        f"raw {['%.1f' % t for t in times]})"
    )


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "micro"
    if mode == "micro":
        micro()
    elif mode == "parts":
        parts(t_cache=int(sys.argv[2]) if len(sys.argv) > 2 else 128)
    elif mode == "glue":
        glue(t_cache=int(sys.argv[2]) if len(sys.argv) > 2 else 128)
    elif mode == "batch":
        timeit_batch(
            n_seq=int(sys.argv[2]) if len(sys.argv) > 2 else 4,
            k=int(sys.argv[3]) if len(sys.argv) > 3 else 5,
            t_cache=int(sys.argv[4]) if len(sys.argv) > 4 else 128,
        )
    else:
        timeit(t_cache=int(sys.argv[2]) if len(sys.argv) > 2 else 128)
