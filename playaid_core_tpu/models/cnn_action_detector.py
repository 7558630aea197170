"""CNN action detector: per-frame ResNet-18 + temporal Conv1d head.

Rebuild of the reference SpatialStreamCNN / CNNActionDetector
(reference: models/cnn_action_detector.py:13-92): each frame of a
[B, T, H, W, 3] window goes through a ResNet-18 (1000-d), a Conv1d with
kernel size T collapses time to one step, then an MLP classifies.  The
forward returns log-probabilities over actions for the window's center
frame, exactly like the reference's ``F.log_softmax(...)``.

TPU notes: the per-frame encoder runs as one fused (B*T) batch on the MXU;
the temporal conv with kernel==T is expressed as a dense over the
flattened time axis (identical math, one matmul instead of a conv XLA
would rewrite anyway).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from playaid_core_tpu.models.resnet import make_resnet


class SpatialStreamCNN(nn.Module):
    num_actions: int
    sequence_length: int
    resnet_features: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [B, T, H, W, 3] float in [0, 1] -> [B, num_actions] logits."""
        b, t = x.shape[0], x.shape[1]
        frames = x.reshape((b * t,) + x.shape[2:])
        feats = make_resnet("resnet18", num_classes=self.resnet_features, dtype=self.dtype,
                            )(frames, train=train)
        # [B, T, F]; Conv1d(F -> 512, kernel=T) over a length-T sequence is a
        # single dense over the flattened (T*F) axis.
        feats = feats.reshape(b, t * self.resnet_features)
        y = nn.Dense(512, dtype=self.dtype, name="temporal_dense")(feats)
        y = nn.relu(y)
        y = nn.Dense(128, dtype=self.dtype, name="mlp_hidden")(y)
        y = nn.relu(y)
        y = nn.Dense(self.num_actions, dtype=self.dtype, name="classifier")(y)
        return y.astype(jnp.float32)


class CNNActionDetector(nn.Module):
    """Forward = log_softmax over center-frame action logits."""

    num_actions: int
    sequence_length: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        logits = SpatialStreamCNN(
            self.num_actions, self.sequence_length, dtype=self.dtype, name="model"
        )(x, train=train)
        return jax.nn.log_softmax(logits, axis=1)
