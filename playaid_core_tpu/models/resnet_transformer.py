"""ResFormer: ResNet-50 encoder + sinusoidal time encoding + Transformer.

Rebuild of the reference's flagship action model (reference:
models/resnet_transformer_detector.py:17-93): frames encode to 2048-d
ResNet-50 features, project to 247-d, concatenate a fixed 9-d
sin/cos frequency encoding of normalized time, run a 3-layer 8-head
post-norm Transformer encoder (d_model 256), and classify every timestep.

TPU notes: d_model 256 and 8 heads tile the MXU exactly; attention and
MLP run in (B, T, 256) with T=7 — tiny sequences, so the win comes from
batching many windows, which the inference pipeline does.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from playaid_core_tpu.models.resnet import make_resnet


def time_encoding(x: np.ndarray, num_freq: int) -> np.ndarray:
    """[T, 1] positions -> [T, 1 + 2*num_freq] sin/cos features
    (reference: models/resnet_transformer_detector.py:17-22)."""
    out = [x]
    for i in range(num_freq):
        out.append(np.cos(np.pi * x * (2**i)))
        out.append(np.sin(np.pi * x * (2**i)))
    return np.concatenate(out, axis=1)


class TransformerEncoderLayer(nn.Module):
    """Post-LN encoder layer matching torch's nn.TransformerEncoderLayer
    defaults (dim_feedforward=2048, relu, post-norm)."""

    d_model: int
    num_heads: int
    dim_feedforward: int = 2048
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.d_model,
            dropout_rate=self.dropout_rate,
            deterministic=not train,
            dtype=self.dtype,
            name="self_attn",
        )(x, x)
        # Residual dropouts match torch's dropout1/dropout2 placement.
        attn = nn.Dropout(self.dropout_rate, deterministic=not train)(attn)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x + attn)

        y = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="ffn_in")(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        y = nn.Dense(self.d_model, dtype=self.dtype, name="ffn_out")(y)
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        x = nn.LayerNorm(dtype=self.dtype, name="norm2")(x + y)
        return x


class ResFormer(nn.Module):
    num_actions: int = 61
    sequence_length: int = 7
    hidden_dim: int = 247
    num_heads: int = 8
    num_layers: int = 3
    num_freq: int = 4
    dtype: Any = jnp.float32
    # Rematerialise the ResNet trunk in the backward pass: trades ~30%
    # FLOPs for the dominant activation memory, letting the per-chip batch
    # grow (jax.checkpoint; the reference had no such lever).
    remat: bool = False

    @nn.compact
    def __call__(self, frames, train: bool = False):
        """frames: [B, T, H, W, 3] -> [B, T, num_actions] logits."""
        b, t = frames.shape[0], frames.shape[1]
        x = frames.reshape((b * t,) + frames.shape[2:])
        resnet_cls = make_resnet("resnet50", num_classes=0, dtype=self.dtype)
        if self.remat:
            cnn_features = nn.remat(type(resnet_cls), static_argnums=(2,))(
                stage_sizes=resnet_cls.stage_sizes,
                block_cls=resnet_cls.block_cls,
                num_classes=0,
                dtype=self.dtype,
            )(x, train)
        else:
            cnn_features = resnet_cls(x, train=train)
        feats = nn.Dense(self.hidden_dim, dtype=self.dtype, name="resnet_ffn")(cnn_features)
        feats = feats.reshape(b, t, self.hidden_dim)

        freq = time_encoding(
            np.linspace(0, 1, self.sequence_length).reshape(-1, 1), self.num_freq
        ).astype(np.float32)
        freq_b = jnp.broadcast_to(jnp.asarray(freq), (b,) + freq.shape)
        y = jnp.concatenate([feats, freq_b.astype(feats.dtype)], axis=2)

        d_model = self.hidden_dim + freq.shape[1]
        for i in range(self.num_layers):
            y = TransformerEncoderLayer(
                d_model, self.num_heads, dtype=self.dtype, name=f"layer_{i}"
            )(y, train=train)

        logits = nn.Dense(self.num_actions, dtype=self.dtype, name="classifier")(y)
        return logits.astype(jnp.float32)


class ResnetTransformerDetector(nn.Module):
    """Forward = log_softmax over per-timestep action logits
    (reference: models/resnet_transformer_detector.py:136-143)."""

    num_actions: int
    sequence_length: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, frames, train: bool = False):
        logits = ResFormer(
            num_actions=self.num_actions,
            sequence_length=self.sequence_length,
            dtype=self.dtype,
            name="model",
        )(frames, train=train)
        return jax.nn.log_softmax(logits, axis=2)
