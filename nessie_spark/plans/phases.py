"""Per-phase wall-clock markers for bench forensics.

The r4 bench could not adjudicate host drift vs plan regression on its
slowest queries because one end-to-end number hides where the time went
(VERDICT r4 "watch item"). Operators wrap their EAGER build stages
(codebook training collects, checkpointed index materialization) in
``phase_timer(query, phase)``; bench.py drains the accumulated dict after
timing each query and emits it next to the total, so next round's diff
can say "training got slower, the scan did not" instead of guessing.

Zero overhead when nothing drains it; never used for correctness."""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager

_TIMES: dict[str, dict[str, float]] = defaultdict(dict)


@contextmanager
def phase_timer(query: str, phase: str):
    t0 = time.time()
    try:
        yield
    finally:
        d = _TIMES[query]
        d[phase] = round(d.get(phase, 0.0) + (time.time() - t0), 3)


def drain(query: str | None = None) -> dict:
    """Return-and-clear: all phases for ``query`` (or every query)."""
    if query is not None:
        return dict(_TIMES.pop(query, {}))
    out = {k: dict(v) for k, v in _TIMES.items()}
    _TIMES.clear()
    return out
