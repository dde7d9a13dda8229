from vaura_tpu.ops import losses, patterns, rope, sampling, schedules

__all__ = ["losses", "patterns", "rope", "sampling", "schedules"]
