"""ResNet backbones in Flax (NHWC, TPU-native).

Replaces the reference's torchvision/timm ResNet-18/50 encoders
(reference: models/cnn_action_detector.py:16, models/rnn_action_detector.py:53,
models/resnet_transformer_detector.py:35) with a from-scratch flax.linen
implementation:

* NHWC layout (XLA's native conv layout on TPU — the MXU tiles HWIO
  weights directly);
* optional bfloat16 compute with float32 params/batch-stats;
* ``num_classes=0`` returns pooled features (timm semantics used by
  ResFormer), ``num_classes=N`` adds the classifier head;
* a converter from torch state dicts so externally-trained reference
  weights can be loaded for parity checks.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any


class BasicBlock(nn.Module):
    """ResNet-18/34 block: two 3x3 convs."""

    filters: int
    conv: ModuleDef
    norm: ModuleDef
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        # Explicit symmetric padding: SAME differs from torch's padding=1
        # on stride-2 convs, which would break converted-weight parity.
        pad = [(1, 1), (1, 1)]
        y = self.conv(self.filters, (3, 3), (self.strides, self.strides), padding=pad)(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), padding=pad)(y)
        y = self.norm(scale_init=nn.initializers.zeros_init())(y)

        if residual.shape != y.shape:
            residual = self.conv(self.filters, (1, 1), (self.strides, self.strides),
                                 name="conv_proj")(residual)
            residual = self.norm(name="norm_proj")(residual)
        return nn.relu(residual + y)


class BottleneckBlock(nn.Module):
    """ResNet-50/101/152 block: 1x1 -> 3x3 -> 1x1 with 4x expansion."""

    filters: int
    conv: ModuleDef
    norm: ModuleDef
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (1, 1))(x)
        y = self.norm()(y)
        y = nn.relu(y)
        # Explicit padding: see BasicBlock.
        y = self.conv(self.filters, (3, 3), (self.strides, self.strides),
                      padding=[(1, 1), (1, 1)])(y)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters * 4, (1, 1))(y)
        y = self.norm(scale_init=nn.initializers.zeros_init())(y)

        if residual.shape != y.shape:
            residual = self.conv(self.filters * 4, (1, 1), (self.strides, self.strides),
                                 name="conv_proj")(residual)
            residual = self.norm(name="norm_proj")(residual)
        return nn.relu(residual + y)


class ResNet(nn.Module):
    """ResNet v1 with a 7x7/2 stem and 3x3/2 max-pool.

    num_classes=0 -> return globally-pooled features
    (512 for ResNet-18, 2048 for ResNet-50).
    """

    stage_sizes: Sequence[int]
    block_cls: ModuleDef
    num_classes: int = 1000
    num_filters: int = 64
    dtype: Any = jnp.float32
    # Return the pre-pool stride-32 feature map instead of pooled
    # features/logits (used by the detector trunk).
    return_feature_map: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )

        x = x.astype(self.dtype)
        x = conv(self.num_filters, (7, 7), (2, 2), padding=[(3, 3), (3, 3)], name="conv_init")(x)
        x = norm(name="bn_init")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for i, block_size in enumerate(self.stage_sizes):
            for j in range(block_size):
                strides = 2 if i > 0 and j == 0 else 1
                x = self.block_cls(
                    self.num_filters * 2**i, conv=conv, norm=norm, strides=strides
                )(x)

        if self.return_feature_map:
            return x
        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes:
            x = nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)
        return x.astype(jnp.float32)


ResNet18 = partial(ResNet, stage_sizes=[2, 2, 2, 2], block_cls=BasicBlock)
ResNet34 = partial(ResNet, stage_sizes=[3, 4, 6, 3], block_cls=BasicBlock)
ResNet50 = partial(ResNet, stage_sizes=[3, 4, 6, 3], block_cls=BottleneckBlock)

FEATURE_DIMS = {"resnet18": 512, "resnet34": 512, "resnet50": 2048}


def make_resnet(arch: str, num_classes: int = 1000, dtype=jnp.float32, **kwargs) -> ResNet:
    factory = {"resnet18": ResNet18, "resnet34": ResNet34, "resnet50": ResNet50}[arch]
    return factory(num_classes=num_classes, dtype=dtype, **kwargs)
