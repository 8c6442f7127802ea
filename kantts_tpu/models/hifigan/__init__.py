from kantts_tpu.models.hifigan.generator import Generator  # noqa: F401
from kantts_tpu.models.hifigan.discriminators import (  # noqa: F401
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    MultiSpecDiscriminator,
)
