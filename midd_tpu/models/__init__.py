from midd_tpu.models.blocks import (  # noqa: F401
    AttentionBlock,
    ConvTransposeTorch,
    GroupNorm32,
    LayerNorm2d,
    NAFBlock,
    ResidualBlock,
    simple_gate,
    sinusoidal_embedding,
)
from midd_tpu.models.direct_unet import ExpertDenoiser  # noqa: F401
from midd_tpu.models.hybrid import (  # noqa: F401
    FusionModule,
    NoiseAnalyzer,
    hybrid_forward,
)
from midd_tpu.models.nafnet import EnhancedNAFNet  # noqa: F401
from midd_tpu.models.tiny_unet import TinyUNet  # noqa: F401
from midd_tpu.models.unet_diffusion import UNetDiffusion  # noqa: F401
