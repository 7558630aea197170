"""Losses and metrics shared by the action-recognition model families.

Matches the reference's supervision patterns:
* center-frame NLL for the CNN family (reference:
  models/cnn_action_detector.py:94-116);
* per-frame (all-timestep) NLL for the RNN and ResFormer families
  (reference: models/rnn_action_detector.py:97-117,
  models/resnet_transformer_detector.py:145-164).
Model forwards return log-probabilities (log_softmax), so the loss is a
plain NLL gather.
"""

from __future__ import annotations

import jax.numpy as jnp


def nll_loss(log_probs, labels):
    """Mean negative log-likelihood. log_probs [N, C], labels [N]."""
    picked = jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
    return -jnp.mean(picked)


def center_frame_loss(log_probs, action_labels):
    """CNN-family supervision: label of the middle frame of the window.
    log_probs [B, C], action_labels [B, T]."""
    center_index = action_labels.shape[1] // 2
    return nll_loss(log_probs, action_labels[:, center_index])


def per_frame_loss(log_probs, action_labels):
    """RNN/ResFormer supervision over every timestep.
    log_probs [B, T, C] or [B*T, C], action_labels [B, T]."""
    flat_labels = action_labels.reshape(-1)
    flat_logp = log_probs.reshape(flat_labels.shape[0], -1)
    return nll_loss(flat_logp, flat_labels)


def accuracy(log_probs, labels):
    """Fraction of argmax matches. Shapes broadcast like the losses."""
    flat_labels = labels.reshape(-1)
    preds = jnp.argmax(log_probs.reshape(flat_labels.shape[0], -1), axis=-1)
    return jnp.mean((preds == flat_labels).astype(jnp.float32))
