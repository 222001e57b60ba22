from ensemble_svs_with_interactions_tpu.base import (  # noqa: F401
    BaseModel,
    PredictionType,
)
from ensemble_svs_with_interactions_tpu.models.generic import (  # noqa: F401
    FFN,
    LSTM,
    MDN,
    RMDN,
    Conv1dResnet,
    Conv1dResnetMDN,
    Conv1dResnetSAR,
    FeedForwardNet,
    FFConvLSTM,
    LSTMEncoder,
    LSTMRNN,
    LSTMRNNSAR,
    MDNv2,
    MultiSpeakerFFConvLSTM,
    MultiTrackLSTMEncoder,
    MultiTrackVariancePredictor,
    SpeakerEmbedding,
    TransformerEncoder,
    VariancePredictor,
)
from ensemble_svs_with_interactions_tpu.models.tacotron import (  # noqa: F401
    MDNNonAttentiveDecoder,
    NonAttentiveDecoder,
    Prenet,
)
from ensemble_svs_with_interactions_tpu.models import acoustic  # noqa: F401
from ensemble_svs_with_interactions_tpu.models.flow_matching import (  # noqa: F401
    FlowMatching,
    MultiSpeakerFlowMatching,
)
from ensemble_svs_with_interactions_tpu.models.postfilters import (  # noqa: F401
    Conv2dPostFilter,
    MultistreamPostFilter,
    variance_scaling,
)
