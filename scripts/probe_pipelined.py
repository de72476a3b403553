"""Probe: steady-state pipelined dispatch of the headline ASR program.

Question: if K requests are dispatched back-to-back (device-resident
inputs, no intermediate fetch), is wall(K) ~= RTT + K * compute?  If so,
the tunnel's per-dispatch round-trip (25-60 ms, session-dependent) can
be measured out of the steady-state per-request latency — the number a
PCIe-local host actually sees (reference protocol: audio already in
server RAM, main.py:577-759).
"""

import statistics
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from wis_tpu.runtime.engine import WhisperEngine, pack_ctl
    from wis_tpu.runtime.residency import ModelRegistry
    from wis_tpu.settings import APISettings

    model, beam, budget = "large", 5, 32
    settings = APISettings(
        whisper_model_default=model, beam_size=beam, long_beam_size=beam,
        batch_buckets=["1", "2", "4", "8"],
    )
    eng = WhisperEngine(ModelRegistry(settings), settings)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(int(3.84 * 16000)) * 0.05 * 32768).astype(
        np.int16
    )
    # warm through the public path (hits the persistent XLA cache)
    for _ in range(2):
        r = eng.transcribe(audio, model=model, beam_size=beam,
                           max_tokens=budget)
    print("single-shot infer_ms:", r.infer_time_ms, flush=True)

    # Rebuild the same dispatch the engine makes, with device-resident args
    from wis_tpu.audio.mel import SAMPLE_RATE
    from wis_tpu.decoding.fused import packed_width
    from wis_tpu.models.whisper.tokenizer import build_prompt

    loaded = eng.registry.get(model)
    tok = loaded.tokenizer
    prompt = np.asarray(
        build_prompt(settings.language, "transcribe", notimestamps=True,
                     layout=tok.layout), np.int32)
    n_samp = eng._sample_bucket(audio.shape[0])
    w = np.zeros((1, n_samp), np.int16)
    w[0, : audio.shape[0]] = audio[:n_samp]
    decode_bucket = eng._decode_bucket(3840, budget)
    prog, fused = eng._program(
        loaded, beam=beam, batch=1, prompt_len=prompt.shape[0],
        detect=False, translate=False, timestamps=False,
        max_new=decode_bucket, n_samples=n_samp, chunked=False)
    args = [loaded.params]
    if fused:
        args.append(eng._packed_decoder(loaded))
    ctl = pack_ctl(prompt[None].copy(), np.ones(1, np.int32), budget)
    d_audio = jax.device_put(w)
    d_ctl = jax.device_put(ctl)
    np.asarray(prog(*args, d_audio, d_ctl))  # warm this exact call

    # live RTT
    f = jax.jit(lambda x: x + 1)
    tiny = np.zeros(8, np.int32)
    np.asarray(f(tiny))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(f(tiny))
        rtts.append((time.perf_counter() - t0) * 1000)
    rtt = statistics.median(rtts)
    print("rtt_ms:", round(rtt, 1), flush=True)

    for K in (1, 2, 4, 8):
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [prog(*args, d_audio, d_ctl) for _ in range(K)]
            np.asarray(outs[-1])
            walls.append((time.perf_counter() - t0) * 1000)
            for o in outs:
                try:
                    o.delete()
                except Exception:
                    pass
        wall = statistics.median(walls)
        per = (wall - rtt) / K
        print(f"K={K}: wall={wall:.1f} ms  (wall-rtt)/K={per:.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
