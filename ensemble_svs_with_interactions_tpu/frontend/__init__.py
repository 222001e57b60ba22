from ensemble_svs_with_interactions_tpu.frontend import ja, merlin, zh  # noqa: F401
