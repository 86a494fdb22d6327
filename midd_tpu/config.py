"""Configuration dataclasses for every model family and runtime.

The reference has no config system at all — every hyperparameter is a hardcoded
call-site literal (e.g. /root/reference/Backend/run.py:34-74,
cddpm/cddpmTrain.py:1-10). This module makes those literals the canonical
*presets* so checkpoints and serving stay compatible, while everything is
overridable.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Sequence, Tuple


def _asdict(cfg) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


@dataclass(frozen=True)
class DiffusionUNetConfig:
    """Conditional epsilon-prediction UNet.

    Mirrors the constructor surface of the reference UNetDiffusion
    (DDIM/DDIMModel.py:168-217 and the cddpm variant cddpm/cddpmModels.py:176-230).
    ``skip_mode``:
      - "ddim":  up-ResBlocks built with in=ch+ch; attention after *every*
        ResBlock at attention resolutions (DDIM/DDIMModel.py:201-211).
      - "cddpm": up-ResBlocks built with in=ch+actual_skip_ch via the tracked
        down_channels list; attention only after the first ResBlock per
        resolution (cddpm/cddpmModels.py:213-224).
    """

    in_channels: int = 1
    model_channels: int = 48
    channel_mult: Tuple[int, ...] = (1, 2, 3, 4)
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (3,)
    dropout: float = 0.0
    time_emb_dim: int = 192
    skip_mode: str = "ddim"  # "ddim" | "cddpm"

    def asdict(self):
        return _asdict(self)


@dataclass(frozen=True)
class NAFNetConfig:
    """EnhancedNAFNet (NafNet/NafnetModel.py:232-309) and the unused model2
    variant (Backend/model2.py:75-153: multiscale intro convs + additive skips,
    no skip_convs)."""

    img_channel: int = 1
    width: int = 32
    middle_blk_num: int = 8
    enc_blk_nums: Tuple[int, ...] = (2, 2, 4, 6)
    dec_blk_nums: Tuple[int, ...] = (2, 2, 2, 2)
    multiscale_intro: bool = False  # model2.py:109-127
    additive_skips: bool = False  # model2.py:138-141 (True => no skip_convs)

    @property
    def padder_size(self) -> int:
        return 2 ** len(self.enc_blk_nums)

    def asdict(self):
        return _asdict(self)


@dataclass(frozen=True)
class ExpertConfig:
    """ExpertDenoiser / DirectUNet (DirectUNet/DirectUNetModel.py:160-255)."""

    in_channels: int = 1
    base_channels: int = 64

    def asdict(self):
        return _asdict(self)


@dataclass(frozen=True)
class RouterConfig:
    """NoiseAnalyzer routing mask UNet (hybrid/hybrid3diffusionspeed.py:470-534)."""

    in_c: int = 1
    out_c: int = 1
    base_c: int = 32

    def asdict(self):
        return _asdict(self)


@dataclass(frozen=True)
class FusionConfig:
    """FusionModule (hybrid/hybrid3diffusionspeed.py:537-557).

    ``residual=True`` is a TPU-native beyond-parity variant (NOT in the
    reference): the fusion stack predicts a CORRECTION added to the NAFNet
    branch instead of re-synthesizing the image from scratch, and its final
    1x1 conv is zero-initialised so training starts exactly at NAFNet
    quality and can only improve from there. Rationale: at ~45 dB output
    fidelity the reference's 12k-param synthesis head is itself the
    quality ceiling (measured: hybrid 44.84 dB < plain NAFNet 45.42 dB on
    xraybench-v1; see PARITY.md hybrid ablation table).
    """

    in_c: int = 3
    out_c: int = 1
    base_c: int = 48
    residual: bool = False
    # TPU-native variant: the fusion also sees the (frozen) ExpertDenoiser
    # branch. Measured motivation (hybrid_ablation round 3): NAFNet and
    # Expert errors correlate only ~0.56 on xraybench-v1, so even a FIXED
    # 0.8/0.2 blend scores +0.25 dB over NAFNet alone — information the
    # reference's 3-input fusion cannot reach.
    sees_expert: bool = False

    def asdict(self):
        return _asdict(self)


@dataclass(frozen=True)
class ScheduleConfig:
    """Linear beta schedule (DDIM/DDIMModel.py:251-257)."""

    noise_steps: int = 50
    beta_start: float = 1e-4
    beta_end: float = 0.02

    def asdict(self):
        return _asdict(self)


@dataclass(frozen=True)
class TinyUNetConfig:
    """TinyUNet fast experimental model (newfastmodel/modelfunctions.py:111-164)."""

    in_ch: int = 2
    base_ch: int = 32
    time_dim: int = 64

    def asdict(self):
        return _asdict(self)


@dataclass(frozen=True)
class HybridConfig:
    """HybridDenoisingRouter composition (hybrid/hybrid3diffusionspeed.py:560-628).

    At serve time the reference forces both step counts to 8 (run.py:72-73).
    """

    nafnet: NAFNetConfig = field(default_factory=NAFNetConfig)
    diffusion: DiffusionUNetConfig = field(default_factory=DiffusionUNetConfig)
    schedule: ScheduleConfig = field(default_factory=ScheduleConfig)
    router: RouterConfig = field(default_factory=RouterConfig)
    fusion: FusionConfig = field(default_factory=FusionConfig)
    # third frozen branch, used only when fusion.sees_expert (TPU-native)
    expert: ExpertConfig = field(default_factory=ExpertConfig)
    training_diffusion_steps: int = 10
    inference_diffusion_steps: int = 10

    def asdict(self):
        return _asdict(self)


# ---------------------------------------------------------------------------
# Canonical serving presets — the exact configs run.py hardcodes (run.py:34-74).
# ---------------------------------------------------------------------------

SERVE_DIFFUSION = DiffusionUNetConfig()
SERVE_NAFNET = NAFNetConfig()
SERVE_EXPERT = ExpertConfig()
SERVE_SCHEDULE = ScheduleConfig()
SERVE_HYBRID = HybridConfig(
    training_diffusion_steps=8, inference_diffusion_steps=8
)
SERVE_IMG_SIZE = 512  # run.py:198
SERVE_DIFFUSION_STEPS = 8  # run.py:107

# TPU-native wide diffusion variant (NOT in the reference; ROADMAP lever 2,
# measured in wide_study.json): same recipe at 96 base channels costs only
# ~1.9x rollout time for 3.9x params (the 48-wide model leaves ~half the MXU
# lanes idle), and at 8 sampling steps it beats the reference-width 50-step
# rollout on BOTH quality and speed (38.30 dB @ 20.0 img/s vs 34.63 @ 7.70,
# xraybench-v1). Train with examples/wide_variant_study.py; the serving
# engine picks the width up from checkpoint metadata automatically.
WIDE_DIFFUSION = DiffusionUNetConfig(model_channels=96)

# TPU-native hybrid profile (round-3 ablation winner, PARITY.md hybrid
# ablation table): residual expert-fed fusion trained with the PSNR-aligned
# l2 loss — +0.47 dB over plain NAFNet on xraybench-v1 through the real
# serving path, where the reference architecture + loss measured -0.58 dB.
# Train: examples/hybrid_ablation.py (cells resid_l2_w48 / resid_exp_l2_w48)
# or recipes.train_hybrid(..., hybrid_cfg=TPU_HYBRID, loss_variant="l2").
# Serves drop-in: the engine reads fusion_params/router_params/expert_params
# from checkpoint metadata.
TPU_HYBRID = HybridConfig(
    fusion=FusionConfig(residual=True, sees_expert=True),
    training_diffusion_steps=8,
    inference_diffusion_steps=8,
)

# Secondary model families.
CDDPM_UNET = DiffusionUNetConfig(skip_mode="cddpm")
TINY_UNET = TinyUNetConfig()
MODEL2_NAFNET = NAFNetConfig(
    width=24,
    enc_blk_nums=(1, 2, 2, 4),
    dec_blk_nums=(1, 1, 2, 2),
    middle_blk_num=8,
    multiscale_intro=True,
    additive_skips=True,
)
