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


pytestmark = pytest.mark.slow  # model-compile-heavy; -m 'not slow' skips


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


def test_load_checkpoint_from_trainer(tmp_path):
    """Trainer orbax checkpoint -> pipeline.load_checkpoint -> identical
    predictions to the in-memory bridge."""
    import cv2

    from playaid_core_tpu.parallel.mesh import make_mesh
    from playaid_core_tpu.train.dataset import UltActionRecogDataset
    from playaid_core_tpu.train.train import Trainer, TrainerConfig

    actions = ["A", "B", "Unknown"]
    rng = np.random.default_rng(0)
    base = tmp_path / "train" / "vid" / "0_byleth"
    (base / "images").mkdir(parents=True)
    (base / "labels").mkdir(parents=True)
    for frame in range(12):
        cv2.imwrite(str(base / "images" / f"{frame:06d}.jpg"),
                    rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
        with open(base / "labels" / f"{frame:06d}.txt", "w") as f:
            f.write(actions[frame % 2])

    ds = UltActionRecogDataset(
        split="train", num_samples=4, img_dimension=32, anim_subset=actions,
        num_frames_per_sample=3, frame_delta=[1], char_subset=["Byleth"],
        crop_size=32, seed=0,
        gt_root_train=str(tmp_path / "train"),
        gt_root_val=str(tmp_path / "none"), gt_root_test=str(tmp_path / "none"),
        stages_dir="/nonexistent", clean_char_dir="/nonexistent",
    )
    config = TrainerConfig(family="cnn", num_actions=3, sequence_length=3,
                           batch_size=2, num_samples=4, crop_size=32,
                           checkpoint_dir=str(tmp_path / "ckpts"))
    trainer = Trainer(config, ds, mesh=make_mesh())
    trainer.init_state()
    path = trainer.save_checkpoint(0)

    pipe = BatchedActionPipeline(family="cnn", num_actions=3, sequence_length=3,
                                 crop_size=32)
    from_ckpt = pipe.load_checkpoint(path)
    in_memory = pipe.from_monolithic({
        "params": jax.device_get(trainer.state.params),
        "batch_stats": jax.device_get(trainer.state.batch_stats),
    })
    seq = jax.random.normal(KEY, (6, 1000))
    l1, c1 = pipe.classify_sequence(from_ckpt, seq, pad_bucket=8)
    l2, c2 = pipe.classify_sequence(in_memory, seq, pad_bucket=8)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-5)
