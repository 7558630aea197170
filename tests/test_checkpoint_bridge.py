"""Trained monolithic checkpoints -> split inference pipeline: the
pipeline's embed+head on converted variables must reproduce the
monolithic model's predictions exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from playaid_core_tpu.infer.pipeline import BatchedActionPipeline
from playaid_core_tpu.models.cnn_action_detector import CNNActionDetector
from playaid_core_tpu.models.resnet_transformer import ResnetTransformerDetector
from playaid_core_tpu.models.rnn_action_detector import RNNActionDetector

KEY = jax.random.PRNGKey(0)


def _window_logits_from_pipeline(pipe, variables, frames):
    """Apply embed to each frame then the head to the window — the
    pipeline's factorized computation for one window [1, T, H, W, 3]."""
    t = frames.shape[1]
    crops = frames.reshape((t,) + frames.shape[2:])
    emb = pipe.embed_crops(variables, crops)
    return pipe._head_jit(variables["head"], emb[None])


@pytest.mark.parametrize("family", ["cnn", "resformer", "rnn"])
def test_pipeline_matches_monolithic(family):
    num_actions, t, s = 5, 3, 32
    if family == "cnn":
        model = CNNActionDetector(num_actions=num_actions, sequence_length=t)
    elif family == "rnn":
        model = RNNActionDetector(num_actions=num_actions)
    else:
        model = ResnetTransformerDetector(num_actions=num_actions, sequence_length=t)

    frames = jax.random.uniform(KEY, (1, t, s, s, 3))
    variables = model.init(KEY, frames)
    mono_out = np.asarray(model.apply(variables, frames, train=False))

    pipe = BatchedActionPipeline(
        family=family, num_actions=num_actions, sequence_length=t, crop_size=s
    )
    split = pipe.from_monolithic(variables)
    pipe_out = np.asarray(_window_logits_from_pipeline(pipe, split, frames))

    if family == "cnn":
        expected = mono_out[0]  # [A]
    elif family == "rnn":
        expected = mono_out.reshape(1, t, num_actions)[0, t // 2]
    else:
        expected = mono_out[0, t // 2]
    np.testing.assert_allclose(pipe_out[0], expected, rtol=1e-4, atol=1e-5)
