"""Per-stage timing (SURVEY §5: the reference has no timers — logging
breadcrumbs only; here per-stage wall times are first-class).

`StageTimer` collects named wall-clock spans; `Codec` keeps one per
encode/decode call in `codec.last_timings`.  On-device work is async —
spans that end on host-visible results (numpy conversion) measure true
completion; others measure dispatch time only and are labeled so.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional, Tuple


class StageTimer:
    def __init__(self) -> None:
        self.spans: List[Tuple[str, float]] = []

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.spans.append((name, time.perf_counter() - t0))

    @property
    def total(self) -> float:
        return sum(dt for _, dt in self.spans)

    def as_dict(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for name, dt in self.spans:
            out[name] = out.get(name, 0.0) + dt
        return out

    def report(self) -> str:
        lines = [f"{name:<24s} {dt * 1000:9.2f} ms" for name, dt in self.spans]
        lines.append(f"{'total':<24s} {self.total * 1000:9.2f} ms")
        return "\n".join(lines)


@contextlib.contextmanager
def timed_stage(timer: Optional[StageTimer], name: str):
    """No-op when timer is None."""
    if timer is None:
        yield
    else:
        with timer.stage(name):
            yield
