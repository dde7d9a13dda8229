from vaura_tpu.train.state import (
    TrainState,
    build_schedule,
    decay_mask,
    make_optimizer,
    trainable_mask,
)

__all__ = [
    "TrainState",
    "build_schedule",
    "decay_mask",
    "make_optimizer",
    "trainable_mask",
]
