"""Tracing/profiling helpers (SURVEY.md section 5.1: the reference has only
tqdm/livelossplot; here jax.profiler traces + wall-clock timers are
first-class)."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace around a block; open the output in XProf/TensorBoard."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str, sink=print) -> Iterator[None]:
    """Wall-clock timer context (synchronise device work yourself — on this
    image's tunneled TPU, force a scalar transfer; see bench.py)."""
    start = time.perf_counter()
    try:
        yield
    finally:
        sink(f"{label}: {time.perf_counter() - start:.3f}s")
