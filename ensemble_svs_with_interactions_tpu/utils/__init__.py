from ensemble_svs_with_interactions_tpu.utils.misc import (  # noqa: F401
    dynamic_import,
    get_world_num_aperiodicities,
    get_world_stream_info,
    init_seed,
    load_utt_list,
    make_non_pad_mask,
    make_pad_mask,
    packaged_question_path,
    pad_2d,
)
from ensemble_svs_with_interactions_tpu.utils.scalers import (  # noqa: F401
    MinMaxScaler,
    StandardScaler,
    extract_static_scaler,
)
