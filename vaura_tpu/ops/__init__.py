from vaura_tpu.ops import (
    audio,
    dropout,
    losses,
    patterns,
    quantization,
    rope,
    sampling,
    schedules,
)

__all__ = [
    "audio",
    "dropout",
    "losses",
    "patterns",
    "quantization",
    "rope",
    "sampling",
    "schedules",
]
