#!/usr/bin/env python3
"""Concurrent load generator — the JMeter rig equivalent.

The reference ships JMeter plans driving POST /api/asr with the flac
fixtures at configurable thread counts (reference client/jmeter-asr.jmx,
run-jmeter.sh:17-18: threads/rampup/iterations, model=large beam_size=5).
Same profile here without the Java dependency:

    python client/loadgen.py --url http://localhost:19000 \\
        --file client/3sec.flac --model large --beam 5 \\
        --threads 10 --iterations 10

Reports per-request latency percentiles, server-side infer_time, and
aggregate throughput — the numbers BASELINE.md tracks.
"""

from __future__ import annotations

import argparse
import asyncio
import json
import statistics
import time

import aiohttp


async def one_request(session, url, data, params):
    form = aiohttp.FormData()
    form.add_field("audio_file", data, filename="audio.flac")
    t0 = time.perf_counter()
    async with session.post(url + "/api/asr", data=form, params=params) as resp:
        body = await resp.json()
        return (time.perf_counter() - t0) * 1000, body, resp.status


async def worker(session, url, data, params, iterations, results, errors):
    for _ in range(iterations):
        try:
            latency, body, status = await one_request(session, url, data, params)
            if status == 200:
                results.append((latency, body.get("infer_time", 0.0)))
            else:
                errors.append(status)
        except aiohttp.ClientError as e:
            errors.append(str(e))


def _pcm_s16le(path: str) -> bytes:
    """Raw 16 kHz s16le PCM for the WS phase (decodes flac/wav via the
    repo ingest; raw files pass through)."""
    with open(path, "rb") as f:
        data = f.read()
    try:
        import sys as _sys
        import os as _os

        _sys.path.insert(0, _os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))))
        from wis_tpu.audio.ingest import load_audio
        import numpy as _np

        audio = load_audio(data)
        return (_np.clip(audio, -1, 1) * 32767).astype("<i2").tobytes()
    except Exception:
        return data  # assume caller passed raw PCM


async def ws_worker(session, url, pcm, obj, iterations, results, errors):
    """One WebSocket streaming session issuing `iterations` sequential
    utterances over the datachannel protocol (start → PCM frames →
    stop → infer response) — the /api/ws/asr path."""
    ws_url = url.replace("http", "ws", 1) + "/api/ws/asr"
    try:
        async with session.ws_connect(ws_url, heartbeat=30) as ws:
            for _ in range(iterations):
                t0 = time.perf_counter()
                await ws.send_str(json.dumps({"type": "start"}))
                for off in range(0, len(pcm), 32768):
                    await ws.send_bytes(pcm[off:off + 32768])
                await ws.send_str(json.dumps({"type": "stop", "obj": obj}))
                while True:
                    msg = await asyncio.wait_for(ws.receive(), timeout=300)
                    if msg.type != aiohttp.WSMsgType.TEXT:
                        errors.append(f"ws: {msg.type}")
                        return
                    parsed = json.loads(msg.data)
                    if parsed.get("type") == "infer":
                        results.append(
                            ((time.perf_counter() - t0) * 1000,
                             parsed["obj"].get("time", 0.0))
                        )
                        break
                    if parsed.get("type") == "error":
                        errors.append(parsed["obj"].get("msg", "ws error"))
                        break
    except (aiohttp.ClientError, asyncio.TimeoutError) as e:
        errors.append(f"ws: {e}")


def _percentiles(results, errors, wall):
    lat = sorted(r[0] for r in results)
    infer = sorted(r[1] for r in results)
    q = lambda xs, p: xs[min(len(xs) - 1, int(p * len(xs)))]  # noqa: E731
    return {
        "requests": len(results),
        "errors": len(errors),
        "wall_s": round(wall, 2),
        "throughput_rps": round(len(results) / wall, 2),
        "latency_ms": {
            "p50": round(q(lat, 0.50), 1),
            "p90": round(q(lat, 0.90), 1),
            "p95": round(q(lat, 0.95), 1),
            "p99": round(q(lat, 0.99), 1),
            "mean": round(statistics.mean(lat), 1),
        },
        "server_infer_ms": {
            "p50": round(q(infer, 0.50), 1),
            "p90": round(q(infer, 0.90), 1),
        },
    }


async def run(args):
    with open(args.file, "rb") as f:
        data = f.read()
    params = {"model": args.model, "beam_size": str(args.beam)}
    report = {}

    results, errors = [], []
    t0 = time.perf_counter()
    async with aiohttp.ClientSession() as session:
        tasks = []
        for i in range(args.threads):
            if args.rampup:
                await asyncio.sleep(args.rampup / args.threads)
            tasks.append(
                asyncio.create_task(
                    worker(session, args.url, data, params, args.iterations,
                           results, errors)
                )
            )
        await asyncio.gather(*tasks)
    wall = time.perf_counter() - t0
    if results:
        report["http"] = _percentiles(results, errors, wall)
    else:
        report["http"] = {"error": "no successful requests", "errors": errors}

    if args.ws_threads > 0:
        pcm = _pcm_s16le(args.file)
        obj = {"model": args.model, "beam_size": args.beam}
        ws_results, ws_errors = [], []
        t0 = time.perf_counter()
        async with aiohttp.ClientSession() as session:
            tasks = [
                asyncio.create_task(
                    ws_worker(session, args.url, pcm, obj,
                              args.iterations, ws_results, ws_errors)
                )
                for _ in range(args.ws_threads)
            ]
            await asyncio.gather(*tasks)
        ws_wall = time.perf_counter() - t0
        if ws_results:
            report["ws"] = _percentiles(ws_results, ws_errors, ws_wall)
        else:
            report["ws"] = {"error": "no successful ws requests",
                            "errors": ws_errors}

    print(json.dumps(report, indent=2))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--url", default="http://localhost:19000")
    p.add_argument("--file", default="/root/reference/client/3sec.flac")
    p.add_argument("--model", default="large")
    p.add_argument("--beam", type=int, default=5)
    p.add_argument("--threads", type=int, default=10)
    p.add_argument("--iterations", type=int, default=10)
    p.add_argument("--rampup", type=float, default=0.0)
    p.add_argument("--ws-threads", type=int, default=0,
                   help="also run N concurrent WebSocket streaming "
                        "sessions (/api/ws/asr datachannel protocol)")
    asyncio.run(run(p.parse_args()))


if __name__ == "__main__":
    main()
