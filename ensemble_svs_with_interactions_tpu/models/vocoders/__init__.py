from ensemble_svs_with_interactions_tpu.models.vocoders.usfgan import (  # noqa: F401
    SignalGenerator,
    USFGANGenerator,
    USFGANWrapper,
    dilated_factor,
)
from ensemble_svs_with_interactions_tpu.models.vocoders.discriminators import (  # noqa: F401
    HiFiGANMultiPeriodDiscriminator,
    HiFiGANMultiScaleDiscriminator,
    HiFiGANMultiScaleMultiPeriodDiscriminator,
    HiFiGANPeriodDiscriminator,
    HiFiGANScaleDiscriminator,
    PWGDiscriminator,
    UnivNetMultiResolutionSpectralDiscriminator,
    UnivNetSpectralDiscriminator,
)
