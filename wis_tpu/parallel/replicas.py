"""Per-chip replica pool — the CTranslate2 `device_index` analog.

The reference loads one CT2 model replica per CUDA device and lets CT2's
inter_threads dispatch batches across them (reference main.py:294-295,
341-354). Here: one WhisperEngine per TPU chip, parameters placed on that
chip, each with its own dynamic-batcher executor; requests round-robin
across replicas (least-loaded first). Throughput scales linearly with
chips — no collectives on this path.
"""

from __future__ import annotations

import itertools
import logging
from concurrent.futures import Future
from typing import List, Optional

import jax

from wis_tpu.runtime.batcher import ASRRequest, InferenceExecutor
from wis_tpu.runtime.engine import WhisperEngine
from wis_tpu.runtime.residency import ModelRegistry
from wis_tpu.settings import APISettings, get_api_settings

logger = logging.getLogger("wis_tpu")


class ReplicaPool:
    def __init__(
        self,
        settings: Optional[APISettings] = None,
        devices: Optional[list] = None,
    ):
        self.settings = settings or get_api_settings()
        devices = devices if devices is not None else jax.devices()
        self.engines: List[WhisperEngine] = []
        self.executors: List[InferenceExecutor] = []
        for dev in devices:
            registry = ModelRegistry(self.settings, device=dev)
            engine = WhisperEngine(registry, self.settings)
            self.engines.append(engine)
            self.executors.append(InferenceExecutor(engine, self.settings))
        self._rr = itertools.count()
        logger.info("REPLICAS: %d device replicas", len(self.executors))

    def start(self) -> None:
        for ex in self.executors:
            ex.start()

    @property
    def queue_depth(self) -> int:
        return sum(ex.queue_depth for ex in self.executors)

    def _pick(self) -> InferenceExecutor:
        # least-loaded; round-robin tiebreak
        start = next(self._rr) % len(self.executors)
        order = self.executors[start:] + self.executors[:start]
        return min(order, key=lambda e: e.queue_depth)

    def submit(self, req: ASRRequest) -> Future:
        return self._pick().submit(req)

    def submit_sync(self, req: ASRRequest):
        return self.submit(req).result()

    def preload(self) -> None:
        for engine in self.engines:
            engine.registry.preload()

    def warmup(self, **kw) -> None:
        for engine in self.engines:
            engine.warmup(**kw)

    def shutdown(self) -> None:
        for ex in self.executors:
            ex.shutdown()
