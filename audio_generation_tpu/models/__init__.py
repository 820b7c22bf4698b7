from audio_generation_tpu.models.quantizer import (  # noqa: F401
    QuantizerState,
    ResidualQuantizer,
)
from audio_generation_tpu.models.vae import CausalVQAE, model_from_config  # noqa: F401
from audio_generation_tpu.models.blocks import (  # noqa: F401
    CausalDecoderBlock,
    CausalEncoderBlock,
    CausalResidualBlock1d,
)
from audio_generation_tpu.models.layers import (  # noqa: F401
    CausalConv1d,
    CausalConvT1d,
    CausalUpsampleConv1d,
    Conv2dTorch,
    FiLM,
    SameConv1d,
    Snake,
    SqueezeExcite,
    StridedConv1d,
)
from audio_generation_tpu.models.wavelets import (  # noqa: F401
    CausalMultiresConv1d,
    MultiresScaleBlock,
    WaveletLayer,
)
from audio_generation_tpu.models.transformers import (  # noqa: F401
    Attention,
    ConformerBlock,
    ConformerConvBlock,
    FeedForward,
    Transformer,
    alibi_matrix,
)
from audio_generation_tpu.models.energy import EnergyTransformer  # noqa: F401
