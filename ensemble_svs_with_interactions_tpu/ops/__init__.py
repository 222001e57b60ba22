from ensemble_svs_with_interactions_tpu.ops import (  # noqa: F401
    mdn,
    mlpg,
    multistream,
)
