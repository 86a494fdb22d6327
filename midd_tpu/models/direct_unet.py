"""ExpertDenoiser — the plain single-shot UNet ("DirectUNet").

Re-design of the reference ExpertDenoiser (DirectUNet/DirectUNetModel.py:160-255):
double-conv (Conv+BN+ReLU) blocks, two MaxPool downs, x8 bottleneck,
ConvTranspose ups with skip concat, final refine + 1x1 out. No input residual.

BatchNorm runs from batch statistics in training and running stats at
inference (the 'batch_stats' collection), matching torch eval semantics for
converted checkpoints.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from midd_tpu.config import ExpertConfig
from midd_tpu.models.blocks import ConvTransposeTorch, tconv


class ExpertDenoiser(nn.Module):
    cfg: ExpertConfig = ExpertConfig()
    dtype: Optional[Any] = None

    def _double(self, x, feats, prefix, train):
        """Conv-BN-ReLU x2, names matching the torch Sequential indices
        (conv at .0/.3, BN at .1/.4)."""
        dt = self.dtype
        for conv_i, bn_i in ((0, 1), (3, 4)):
            x = tconv(feats, 3, use_bias=False, name=f"{prefix}_{conv_i}", dtype=dt)(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                name=f"{prefix}_{bn_i}",
                dtype=jnp.float32,
            )(x)
            x = nn.relu(x)
        return x

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        bc = self.cfg.base_channels
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)

        x1 = self._double(x, bc, "inc", train)
        x2 = self._double(x1, bc * 2, "down1", train)
        x2p = nn.max_pool(x2, (2, 2), strides=(2, 2))
        x3 = self._double(x2p, bc * 4, "down2", train)
        x3p = nn.max_pool(x3, (2, 2), strides=(2, 2))

        x4 = self._double(x3p, bc * 8, "bottleneck", train)

        xd2 = ConvTransposeTorch(bc * 4, 2, 2, 0, name="up2", dtype=dt)(x4)
        xd2 = jnp.concatenate([xd2, x3], axis=-1)
        xd2 = self._double(xd2, bc * 4, "upconv2", train)

        xd1 = ConvTransposeTorch(bc * 2, 2, 2, 0, name="up1", dtype=dt)(xd2)
        xd1 = jnp.concatenate([xd1, x2], axis=-1)
        xd1 = self._double(xd1, bc * 2, "upconv1", train)

        xd1 = tconv(bc, 3, use_bias=False, name="final_0", dtype=dt)(xd1)
        xd1 = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            name="final_1",
            dtype=jnp.float32,
        )(xd1)
        xd1 = nn.relu(xd1)
        return tconv(self.cfg.in_channels, 1, name="outc", dtype=dt)(xd1)
