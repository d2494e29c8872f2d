"""Cross-cutting utilities: timing, profiling, observability."""

from vcf_tpu.utils.timing import StageTimer, timed_stage
from vcf_tpu.utils.profiling import trace, device_memory_stats

__all__ = ["StageTimer", "timed_stage", "trace", "device_memory_stats"]
