from ensemble_svs_with_interactions_tpu.io import hts  # noqa: F401
