from vaura_tpu.models import bridges, motionformer, sampler
from vaura_tpu.models import dac

__all__ = ["bridges", "dac", "motionformer", "sampler"]
