from ensemble_svs_with_interactions_tpu.data.data_source import (  # noqa: F401
    DurationFeatureSource,
    MelF0AcousticSource,
    MultiTrackMusicalLinguisticSource,
    MusicalLinguisticSource,
    TimeLagFeatureSource,
    WORLDAcousticSource,
)
