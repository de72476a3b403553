#!/usr/bin/env python3
"""Concurrent TTS streaming load generator.

The reference publishes no TTS load rig (its JMeter plans only drive
ASR), so this is the missing half: N concurrent GET /api/tts streaming
sessions against the XTTS server (reference xtts/main.py:243-325), each
measuring time-to-first-audio-byte and per-stream realtime factor
(audio-seconds received per wall-second). A streaming TTS deployment is
healthy while every concurrent stream holds RTF >= 1.0.

    python client/loadgen_tts.py --url http://localhost:19010 \\
        --streams 4 --iterations 3 --min-audio-tokens 140

min_audio_tokens pins the utterance length under random weights the way
bench.py's TTS row does (default 0 is inert with real checkpoints).
"""

from __future__ import annotations

import argparse
import asyncio
import json
import statistics
import time

import aiohttp

SENTENCES = [
    "The quick brown fox jumps over the lazy dog near the river bank.",
    "A gentle rain fell on the quiet town all through the early morning.",
    "Seven bright lanterns floated slowly across the evening harbor sky.",
    "The old clock in the hallway chimed twice and then fell silent.",
]

WAV_HEADER_BYTES = 44
SR = 24000
BYTES_PER_S = SR * 2  # s16le mono


async def one_stream(session, url, text, params):
    """GET /api/tts, consume the chunked WAV; returns
    (ttfb_ms, audio_s, wall_s, status)."""
    q = dict(params, text=text)
    t0 = time.perf_counter()
    ttfb = None
    total = 0
    async with session.get(url + "/api/tts", params=q) as resp:
        async for chunk in resp.content.iter_chunked(65536):
            if ttfb is None and total + len(chunk) > WAV_HEADER_BYTES:
                ttfb = (time.perf_counter() - t0) * 1000
            total += len(chunk)
        wall = time.perf_counter() - t0
        audio_s = max(0, total - WAV_HEADER_BYTES) / BYTES_PER_S
        return ttfb, audio_s, wall, resp.status


async def worker(session, url, idx, params, iterations, results, errors):
    for i in range(iterations):
        text = SENTENCES[(idx + i) % len(SENTENCES)]
        try:
            ttfb, audio_s, wall, status = await one_stream(
                session, url, text, params
            )
            if status == 200 and audio_s > 0 and ttfb is not None:
                results.append((ttfb, audio_s, wall))
            else:
                errors.append(status)
        except aiohttp.ClientError as e:
            errors.append(str(e))


async def run(args):
    params = {
        "language": "en",
        "speaker": "default",
        "stream_chunk_size": str(args.chunk),
        "min_audio_tokens": str(args.min_audio_tokens),
    }
    results, errors = [], []
    timeout = aiohttp.ClientTimeout(total=args.timeout)
    async with aiohttp.ClientSession(timeout=timeout) as session:
        # warmup (compiles stream programs server-side on first use)
        await one_stream(session, args.url, SENTENCES[0], params)
        t0 = time.perf_counter()
        await asyncio.gather(
            *(
                worker(session, args.url, i, params, args.iterations,
                       results, errors)
                for i in range(args.streams)
            )
        )
        wall = time.perf_counter() - t0

    ttfbs = sorted(r[0] for r in results)
    rtfs = sorted(r[1] / r[2] for r in results if r[2] > 0)
    total_audio = sum(r[1] for r in results)
    out = {
        "streams": args.streams,
        "iterations": args.iterations,
        "stream_chunk_size": args.chunk,
        "min_audio_tokens": args.min_audio_tokens,
        "completed": len(results),
        "errors": len(errors),
        "ttfb_ms_p50": round(statistics.median(ttfbs), 1) if ttfbs else None,
        "ttfb_ms_p95": round(ttfbs[int(0.95 * (len(ttfbs) - 1))], 1) if ttfbs else None,
        "per_stream_rtf_p50": round(statistics.median(rtfs), 2) if rtfs else None,
        "per_stream_rtf_min": round(rtfs[0], 2) if rtfs else None,
        "aggregate_rtf": round(total_audio / wall, 2) if wall > 0 else None,
        "total_audio_s": round(total_audio, 1),
        "wall_s": round(wall, 1),
    }
    print(json.dumps(out))
    return 0 if not errors else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://localhost:19010")
    ap.add_argument("--streams", type=int, default=4)
    ap.add_argument("--iterations", type=int, default=3)
    ap.add_argument("--chunk", type=int, default=20)
    ap.add_argument("--min-audio-tokens", type=int, default=140)
    ap.add_argument("--timeout", type=float, default=3600)
    args = ap.parse_args()
    raise SystemExit(asyncio.run(run(args)))


if __name__ == "__main__":
    main()
