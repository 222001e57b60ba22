from ensemble_svs_with_interactions_tpu.models.acoustic.multistream import (  # noqa: F401
    MultiSpeakerMultistreamSeparateF0ParametricModel,
    MultistreamSeparateF0ParametricModel,
    MultiTrackMultistreamSeparateF0ParametricModel,
)
from ensemble_svs_with_interactions_tpu.models.acoustic.resf0 import (  # noqa: F401
    ResF0Conv1dResnet,
    ResF0VariancePredictor,
)
from ensemble_svs_with_interactions_tpu.models.acoustic.sinsy import (  # noqa: F401
    ResSkipF0FFConvLSTM,
)
from ensemble_svs_with_interactions_tpu.models.acoustic.tacotron_f0 import (  # noqa: F401
    BiLSTMMDNNonAttentiveDecoder,
    BiLSTMNonAttentiveDecoder,
    BiLSTMResF0NonAttentiveDecoder,
    MultiTrackBiLSTMResF0NonAttentiveDecoder,
    ResF0NonAttentiveDecoder,
)
from ensemble_svs_with_interactions_tpu.models.acoustic.util import (  # noqa: F401
    predict_lf0_with_residual,
)
from ensemble_svs_with_interactions_tpu.models.acoustic.npss import (  # noqa: F401
    MultiSpeakerNPSSMDNMultistreamParametricModel,
    MultiTrackNPSSMDNMultistreamParametricModel,
    NPSSMDNMultistreamParametricModel,
    NPSSMultistreamParametricModel,
)
from ensemble_svs_with_interactions_tpu.models.acoustic.multistream import (  # noqa: F401
    MDNMultistreamSeparateF0MelModel,
    MultistreamSeparateF0MelModel,
)
from ensemble_svs_with_interactions_tpu.models.acoustic.resf0 import (  # noqa: F401
    ResF0TransformerEncoder,
)
from ensemble_svs_with_interactions_tpu.models.acoustic.tacotron_f0 import (  # noqa: F401
    MDNResF0NonAttentiveDecoder,
)
from ensemble_svs_with_interactions_tpu.models.acoustic.multistream import (  # noqa: F401
    MultiTrackMultistreamSeparateF0ParametricModelv3,
)
from ensemble_svs_with_interactions_tpu.models.acoustic.npss import (  # noqa: F401
    V2MultiTrackNPSSMDNMultistreamParametricModel,
)
