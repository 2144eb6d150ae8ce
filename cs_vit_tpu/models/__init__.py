from .modules import (  # noqa: F401
    MHA,
    LoraCompatibleMHA,
    ContinuousAngleEmbedding,
    CrossAttnDecoder,
    DecoderBlock,
    EncoderBlock,
    FeedForwardNetwork,
    PositionalEncoding,
    RoPE2DPositionalEncoding,
    TorchBatchNorm,
)
from .latent import (  # noqa: F401
    ScaleRotComplexEmbedTransformationGroup,
    ScaleRotTransformationGroup,
)
from .poser import (  # noqa: F401
    PerspectiveEncoder,
    Poser,
    PoserConfig,
    SpatialEncoder,
    TemporalEncoder,
    phase_trainable_mask,
)
from .swinv2 import (  # noqa: F401
    SwinV2,
    SwinV2Config,
    convert_hf_swinv2_state_dict,
    swinv2_base_256,
    swinv2_tiny_256,
)
