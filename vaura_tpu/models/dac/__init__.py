from vaura_tpu.models.dac.model import (
    Dac,
    DacConfig,
    DacSpec,
    config_for_sample_rate,
)

__all__ = ["Dac", "DacConfig", "DacSpec", "config_for_sample_rate"]
