from ensemble_svs_with_interactions_tpu.train import (  # noqa: F401
    losses,
    metrics,
)
