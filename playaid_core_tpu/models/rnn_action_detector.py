"""RNN action detector: ResNet-18 encoder + 3-layer LSTM + MLP decoder.

Rebuild of the reference RNNActionDetector (reference:
models/rnn_action_detector.py:14-95): frames encode to 300-d, a 3-layer
LSTM (hidden 512) runs over time, and every timestep is decoded to action
log-probabilities (per-frame supervision).

TPU notes: the recurrence uses ``nn.scan`` over OptimizedLSTMCell — the
XLA-friendly formulation (gates fused into two matmuls per step); the
encoder runs as one (B*T) batch.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from playaid_core_tpu.models.resnet import make_resnet


class StackedLSTM(nn.Module):
    hidden_size: int = 512
    num_layers: int = 3

    @nn.compact
    def __call__(self, x):
        """x: [B, T, F] -> [B, T, hidden]."""
        for layer in range(self.num_layers):
            cell = nn.OptimizedLSTMCell(self.hidden_size, name=f"lstm_{layer}")
            scan = nn.RNN(cell, name=f"rnn_{layer}")
            x = scan(x)
        return x


class RNNActionDetector(nn.Module):
    num_actions: int
    encoder_features: int = 300
    hidden_size: int = 512
    num_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [B, T, H, W, 3] -> [B*T, num_actions] log-probs (matching the
        reference's flattened per-frame output shape,
        models/rnn_action_detector.py:92-95)."""
        b, t = x.shape[0], x.shape[1]
        frames = x.reshape((b * t,) + x.shape[2:])
        feats = make_resnet("resnet18", num_classes=0, dtype=self.dtype)(frames, train=train)
        feats = nn.Dense(self.encoder_features, dtype=self.dtype, name="encoder_proj")(feats)
        feats = feats.reshape(b, t, self.encoder_features)

        hidden = StackedLSTM(self.hidden_size, self.num_layers, name="lstm")(feats)

        y = hidden.reshape(b * t, self.hidden_size)
        y = nn.Dense(128, dtype=self.dtype, name="decoder_hidden")(y)
        y = nn.relu(y)
        y = nn.Dense(self.num_actions, dtype=self.dtype, name="decoder_out")(y)
        return jax.nn.log_softmax(y.astype(jnp.float32), axis=1)
