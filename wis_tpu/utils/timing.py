"""Structured per-stage timing.

The reference instruments every pipeline stage with ad-hoc
``datetime.now()`` pairs and debug logs (reference main.py:597-600,
619-624, 664-670, 698-701, 715-718, 756-761). Here the same spans are
first-class: a ``StageTimer`` collects named spans, exposes them as a dict
(returned in API responses / logs), and can emit ``jax.profiler`` trace
annotations when profiling is enabled.
"""

from __future__ import annotations

import logging
import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional

logger = logging.getLogger("wis_tpu")


@dataclass
class TimingSpan:
    name: str
    start: float
    end: Optional[float] = None

    @property
    def ms(self) -> float:
        end = self.end if self.end is not None else time.perf_counter()
        return (end - self.start) * 1000.0


@dataclass
class StageTimer:
    """Collects named wall-clock spans for one request."""

    spans: List[TimingSpan] = field(default_factory=list)
    _t0: float = field(default_factory=time.perf_counter)

    @contextmanager
    def span(self, name: str, trace: bool = False) -> Iterator[TimingSpan]:
        s = TimingSpan(name, time.perf_counter())
        self.spans.append(s)
        ctx = None
        if trace:
            try:
                import jax.profiler

                ctx = jax.profiler.TraceAnnotation(name)
                ctx.__enter__()
            except Exception:
                ctx = None
        try:
            yield s
        finally:
            s.end = time.perf_counter()
            if ctx is not None:
                ctx.__exit__(None, None, None)
            logger.debug("TIMING: %s took %.2f ms", name, s.ms)

    def total_ms(self) -> float:
        return (time.perf_counter() - self._t0) * 1000.0

    def as_dict(self) -> Dict[str, float]:
        """Spans sharing a name SUM (a chunked request dispatches one
        `asr_dispatch` span per window group — overwriting would fold
        earlier groups' device time into callers' host-side subtraction,
        e.g. bench.py's `infer_time - asr_dispatch`; ADVICE r4)."""
        out: Dict[str, float] = {}
        for s in self.spans:
            out[s.name] = round(out.get(s.name, 0.0) + s.ms, 3)
        return out
