"""Dynamic batcher / inference executor.

The reference serializes all inference: gunicorn runs ONE worker and
`do_whisper` is a blocking call made straight from async handlers
(reference entrypoint.sh:19, main.py:1204-1215) — concurrent requests
head-of-line block each other and the GPU sees batch=1 per request.

Here a dedicated inference thread owns the device. Concurrent short
(≤30 s, single-window) requests that share (model, effective-beam) are
coalesced within a small window into one padded TPU batch — per-sequence
prompts mean mixed languages/tasks batch together — and dispatched as a
single compiled program. Long-form (chunked) requests run solo since they
already fill a batch with their own windows. Async handlers get a Future.
"""

from __future__ import annotations

import logging
import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from wis_tpu.runtime.engine import TranscriptionResult, WhisperEngine
from wis_tpu.settings import APISettings

logger = logging.getLogger("wis_tpu")


@dataclass
class ASRRequest:
    audio: np.ndarray  # 16 kHz mono float32
    model: str
    beam_size: int
    task: str = "transcribe"
    detect_language: bool = False
    force_language: Optional[str] = None
    translate: bool = False
    max_tokens: Optional[int] = None
    timestamps: bool = False
    word_timestamps: bool = False
    future: Future = field(default_factory=Future)

    def effective_beam(self, settings: APISettings) -> int:
        duration_ms = self.audio.shape[0] / 16  # samples @16k → ms
        if duration_ms >= settings.long_beam_size_threshold:
            return settings.long_beam_size
        return self.beam_size

    def is_long(self) -> bool:
        return self.audio.shape[0] > 30 * 16000

    def batch_key(self, settings: APISettings):
        # timestamped requests compile a different program variant.
        # detect/force/default-language requests DO coalesce: the fused
        # program takes a per-row detect mask, so a detect row never
        # overwrites a neighbor's forced or default language.
        # word_timestamps requests run an extra per-request alignment
        # dispatch (engine._word_align) — keyed apart so they never
        # coalesce (the coalesced path has no alignment support).
        return (
            self.model,
            self.effective_beam(settings),
            self.timestamps,
            self.word_timestamps,
        )


class InferenceExecutor:
    """Single consumer thread that owns device dispatch order."""

    def __init__(self, engine: WhisperEngine, settings: Optional[APISettings] = None):
        self.engine = engine
        self.settings = settings or engine.settings
        self._queue: "queue.Queue[Optional[ASRRequest]]" = queue.Queue()
        self._thread = threading.Thread(
            target=self._worker, name="wis-inference", daemon=True
        )
        self._started = False
        self._lock = threading.Lock()

    def start(self) -> None:
        with self._lock:
            if not self._started:
                self._started = True
                self._thread.start()

    def shutdown(self) -> None:
        if self._started:
            self._queue.put(None)
            self._thread.join(timeout=5)
            self._started = False

    # ------------------------------------------------------------------ #
    def submit(self, req: ASRRequest) -> Future:
        self.start()
        self._queue.put(req)
        return req.future

    def submit_sync(self, req: ASRRequest) -> TranscriptionResult:
        return self.submit(req).result()

    @property
    def queue_depth(self) -> int:
        return self._queue.qsize()

    # ------------------------------------------------------------------ #
    def _worker(self) -> None:
        import time

        max_batch = self.settings.batch_bucket_list()[-1]
        while True:
            req = self._queue.get()
            if req is None:
                return
            batch = [req]
            if not req.is_long():
                key = req.batch_key(self.settings)
                stop = False

                def drain(block_until: float | None) -> bool:
                    """Pull compatible requests into `batch`; returns True
                    on shutdown sentinel. block_until=None → non-blocking."""
                    nonlocal stop
                    while len(batch) < max_batch:
                        try:
                            if block_until is None:
                                nxt = self._queue.get_nowait()
                            else:
                                tmo = block_until - time.monotonic()
                                if tmo <= 0:
                                    return False
                                nxt = self._queue.get(timeout=tmo)
                        except queue.Empty:
                            return False
                        if nxt is None:
                            stop = True
                            return True
                        if nxt.is_long() or nxt.batch_key(self.settings) != key:
                            # incompatible: run what we have, requeue it
                            self._queue.put(nxt)
                            return True
                        batch.append(nxt)
                    return True

                # 1) requests that queued while the device was busy join
                #    the NEXT dispatch immediately — no window wait for a
                #    request that has already been waiting
                full = drain(None)
                # 2) an idle-arrival singleton lingers (one absolute
                #    batch_window_s) for near-simultaneous arrivals
                if not full and len(batch) == 1:
                    full = drain(time.monotonic() + self.settings.batch_window_s)
                # 3) a partial batch that is already coalescing (≥2 ⇒
                #    under concurrent load) admits stragglers with an
                #    inter-arrival window: each window that lands at least
                #    one more request extends the wait by batch_admit_s;
                #    one silent window dispatches. Needed because device
                #    dispatch holds the GIL on single-core hosts, so
                #    peers' requests only get parsed and enqueued while
                #    this thread blocks here — without it the batcher
                #    phase-locks at batch 2-3 with 10 clients in flight
                #    (measured 7.75 req/s locked vs 13+ unlocked).
                #    The total straggler wait is capped by an ABSOLUTE
                #    deadline (batch_admit_max_s from the first window) so
                #    a steady trickle can't extend the first request's
                #    queueing delay window-by-window up to max_batch
                #    (ADVICE r4: a 2-3 client workload would otherwise pay
                #    up to (max_batch-2)*batch_admit_s of silent wait).
                deadline = time.monotonic() + self.settings.batch_admit_max_s
                while not full and not stop and 1 < len(batch) < max_batch:
                    before = len(batch)
                    until = min(
                        time.monotonic() + self.settings.batch_admit_s, deadline
                    )
                    if until <= time.monotonic():
                        break
                    full = drain(until)
                    if len(batch) == before:
                        break
                if stop:
                    self._run(batch)
                    return
            self._run(batch)

    def _run(self, batch: List[ASRRequest]) -> None:
        try:
            # word_timestamps batches (homogeneous by batch_key) run
            # per-request: each needs its own alignment dispatch
            if len(batch) == 1 or batch[0].word_timestamps:
                for r in batch:
                    r.future.set_result(
                        self.engine.transcribe(
                            r.audio,
                            model=r.model,
                            beam_size=r.beam_size,
                            task=r.task,
                            detect_language=r.detect_language,
                            force_language=r.force_language,
                            translate=r.translate,
                            max_tokens=r.max_tokens,
                            timestamps=r.timestamps,
                            word_timestamps=r.word_timestamps,
                        )
                    )
                return
            logger.debug("BATCHER: coalesced %d requests", len(batch))
            results = self.engine.transcribe_coalesced(batch)
            for r, res in zip(batch, results):
                r.future.set_result(res)
        except Exception as e:  # propagate to all waiters
            logger.exception("BATCHER: inference failed")
            for r in batch:
                if not r.future.done():
                    r.future.set_exception(e)
