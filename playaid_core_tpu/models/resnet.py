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
import jax
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


def _s2d_stem_kernel(w):
    """Rearrange a [7, 7, C, F] stride-2 stem kernel into the equivalent
    [4, 4, 4C, F] kernel over 2x2 space-to-depth input.

    Derivation: with ky' = ky + 1 (one zero row/col padded at the FRONT),
    the source pixel index 2*oy + ky - 3 becomes 2*(oy + ty - 2) + dy for
    ky' = 2*ty + dy — i.e. a 4x4 stride-1 conv over the 2x2-block grid
    with block padding (2, 1).  Exact (same arithmetic, re-tiled); the
    MLPerf-ResNet space-to-depth trick.
    """
    w8 = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
    k, _, c, f = w8.shape[0] // 2, None, w8.shape[2], w8.shape[3]
    # [8, 8, C, F] -> [ty, dy, tx, dx, C, F] -> [ty, tx, dy, dx, C, F]
    w4 = w8.reshape(4, 2, 4, 2, c, f).transpose(0, 2, 1, 3, 4, 5)
    return w4.reshape(4, 4, 4 * c, f)


class _S2DStem(nn.Module):
    """Space-to-depth stem: owns the SAME [7, 7, C, F] ``kernel`` param
    an nn.Conv stem would (tree path ``conv_init/kernel`` — checkpoints
    and torch-converted weights load unchanged), computed as the exact
    equivalent 4x4 stride-1 conv over 2x2-block input."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w_, c = x.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, c, self.features)
        )
        k4 = _s2d_stem_kernel(kernel).astype(self.dtype)
        x2 = x.reshape(b, h // 2, 2, w_ // 2, 2, c)
        x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w_ // 2, 4 * c)
        return jax.lax.conv_general_dilated(
            x2.astype(self.dtype), k4, window_strides=(1, 1),
            padding=[(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class ResNet(nn.Module):
    """ResNet v1 with a 7x7/2 stem and 3x3/2 max-pool.

    num_classes=0 -> return globally-pooled features
    (512 for ResNet-18, 2048 for ResNet-50).

    ``s2d_stem=True`` computes the stem as a 4x4 stride-1 conv over
    2x2 space-to-depth input — mathematically identical (the kernel is
    rearranged in-graph from the same ``conv_init`` parameter, so
    checkpoints/converted weights are unaffected) but it quadruples the
    stem's input-channel depth (3 -> 12), which the MXU tiles far better
    than a 3-channel 7x7 window.
    """

    stage_sizes: Sequence[int]
    block_cls: ModuleDef
    num_classes: int = 1000
    num_filters: int = 64
    dtype: Any = jnp.float32
    # Return the pre-pool stride-32 feature map instead of pooled
    # features/logits (used by the detector trunk).
    return_feature_map: bool = False
    s2d_stem: bool = False

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
        if self.s2d_stem and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            x = _S2DStem(self.num_filters, dtype=self.dtype, name="conv_init")(x)
        else:
            x = conv(self.num_filters, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                     name="conv_init")(x)
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
