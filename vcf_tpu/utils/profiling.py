"""Profiler hooks (SURVEY §5: build jax.profiler tracing as
first-class; the reference has none)."""

from __future__ import annotations

import contextlib
from typing import Dict


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/vcf_tpu_trace"):
    """Capture a jax.profiler trace (viewable in TensorBoard/Perfetto)
    around a block of codec work:

        with profiling.trace("/tmp/trace"):
            codec.encode(img)
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict:
    """Per-device memory stats where the backend exposes them."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
