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


async def run(args):
    with open(args.file, "rb") as f:
        data = f.read()
    params = {"model": args.model, "beam_size": str(args.beam)}
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

    if not results:
        print(json.dumps({"error": "no successful requests", "errors": errors}))
        return
    lat = sorted(r[0] for r in results)
    infer = sorted(r[1] for r in results)
    q = lambda xs, p: xs[min(len(xs) - 1, int(p * len(xs)))]  # noqa: E731
    print(
        json.dumps(
            {
                "requests": len(results),
                "errors": len(errors),
                "wall_s": round(wall, 2),
                "throughput_rps": round(len(results) / wall, 2),
                "latency_ms": {
                    "p50": round(q(lat, 0.50), 1),
                    "p90": round(q(lat, 0.90), 1),
                    "p99": round(q(lat, 0.99), 1),
                    "mean": round(statistics.mean(lat), 1),
                },
                "server_infer_ms": {
                    "p50": round(q(infer, 0.50), 1),
                    "p90": round(q(infer, 0.90), 1),
                },
            },
            indent=2,
        )
    )


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--url", default="http://localhost:19000")
    p.add_argument("--file", default="/root/reference/client/3sec.flac")
    p.add_argument("--model", default="large")
    p.add_argument("--beam", type=int, default=5)
    p.add_argument("--threads", type=int, default=10)
    p.add_argument("--iterations", type=int, default=10)
    p.add_argument("--rampup", type=float, default=0.0)
    asyncio.run(run(p.parse_args()))


if __name__ == "__main__":
    main()
