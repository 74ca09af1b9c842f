"""Device profiling helpers.

The reference only has wall-clock scopes (utils/logger.py:311-340 profile_kv,
kept in utils/logger.py here). TPU-native additions: `jax.profiler` trace
capture around a step window (viewable in TensorBoard/XProf/Perfetto) and a
per-step device-memory KV hook.
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional

import jax

from . import logger


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """Capture an XLA device trace for everything inside the scope."""
    log_dir = log_dir or os.path.join(logger.get_dir(), "profile")
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def maybe_trace_step(step: int, start: int, num_steps: int, log_dir=None):
    """Returns a context manager that traces steps [start, start+num_steps)."""
    if start <= step < start + num_steps:
        return trace(log_dir)
    return contextlib.nullcontext()


def log_memory_kvs(prefix: str = "mem", device=None) -> None:
    """logkv peak/in-use device memory (GiB)."""
    device = device or jax.local_devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if not stats:
        return
    gib = 1024**3
    if "bytes_in_use" in stats:
        logger.logkv(f"{prefix}_in_use_gib", stats["bytes_in_use"] / gib)
    if "peak_bytes_in_use" in stats:
        logger.logkv(f"{prefix}_peak_gib", stats["peak_bytes_in_use"] / gib)
    if "bytes_limit" in stats:
        logger.logkv(f"{prefix}_limit_gib", stats["bytes_limit"] / gib)
