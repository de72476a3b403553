from wis_tpu.utils.timing import StageTimer, TimingSpan

__all__ = ["StageTimer", "TimingSpan"]
