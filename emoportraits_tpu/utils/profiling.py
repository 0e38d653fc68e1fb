"""Tracing / profiling built in (the reference has none — SURVEY.md §5 'Tracing: none';
this framework ships phase timers and JAX profiler integration from day 1).

Usage:
    with phase_timer("train_step"):
        state, metrics = step(...)
    print(phase_report())

    with device_trace("/tmp/jax-trace"):   # open in TensorBoard / Perfetto
        run_steps()
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax

_PHASES: Dict[str, list] = defaultdict(list)


@contextlib.contextmanager
def phase_timer(name: str, block: bool = False) -> Iterator[None]:
    """Wall-clock phase timing; `block=True` synchronizes the device first so the
    measurement covers actual execution, not dispatch."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if block:
            try:
                jax.effects_barrier()
            except Exception:
                pass
        _PHASES[name].append(time.perf_counter() - t0)


def phase_report(reset: bool = False) -> Dict[str, Dict[str, float]]:
    out = {}
    for name, times in _PHASES.items():
        n = len(times)
        out[name] = {
            "count": n,
            "total_s": sum(times),
            "mean_ms": 1e3 * sum(times) / max(n, 1),
            "last_ms": 1e3 * times[-1] if times else 0.0,
        }
    if reset:
        _PHASES.clear()
    return out


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """JAX profiler trace (XLA device timeline) around a region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in profiler timelines (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)
