from ensemble_svs_with_interactions_tpu.models.vocoders.sifigan import (  # noqa: F401
    HiFiGANGenerator,
    SiFiGANGenerator,
)
from ensemble_svs_with_interactions_tpu.models.vocoders.cheaptrick import (  # noqa: F401
    CheapTrickLayer,
    source_regularization_loss,
)
from ensemble_svs_with_interactions_tpu.models.vocoders.usfgan import (  # noqa: F401
    CascadeHnUSFGANGenerator,
    ParallelHnUSFGANGenerator,
    PeriodicityEstimator,
    PWGGenerator,
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
    UnivNetMultiResolutionMultiPeriodDiscriminator,
    UnivNetMultiResolutionSpectralDiscriminator,
    UnivNetSpectralDiscriminator,
)
