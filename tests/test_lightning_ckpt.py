"""Lightning .ckpt container ingestion round-trip.

Builds a reference-shaped Lightning checkpoint container (state_dict with
the reference's module names + hyper_parameters holding objects our code
must NOT need to import), saves it with torch.save, and restores it end
to end into the BatchedActionPipeline (the reference loads these with
``load_from_checkpoint`` — reference: ai_runner.py:164-168).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from playaid_core_tpu.models.lightning_ckpt import (  # noqa: E402
    convert_reference_checkpoint,
    extract_state_dict,
    load_lightning_checkpoint,
    load_pipeline_from_ckpt,
)

from test_torch_parity import TorchResNet18, _randomize_bn_stats  # noqa: E402


class _CustomHParams:
    """Stands in for Lightning's AttributeDict / user config objects that
    torch.load(weights_only=True) refuses."""

    def __init__(self):
        self.actions = ["Jab 1", "FTilt"]
        self.lr = 2e-4


NUM_ACTIONS, SEQ_LEN = 6, 3


def _make_reference_cnn():
    """Reference CNNActionDetector-shaped torch module (state-dict names
    model.cnn2d.* / model.cnn1d.0.* / model.classifier.{0,2}.* —
    reference: models/cnn_action_detector.py:13-43)."""

    class TorchSpatialStreamCNN(tnn.Module):
        def __init__(self):
            super().__init__()
            self.cnn2d = TorchResNet18(num_classes=1000)
            self.cnn1d = tnn.Sequential(
                tnn.Conv1d(1000, 512, kernel_size=SEQ_LEN, stride=1), tnn.ReLU()
            )
            self.classifier = tnn.Sequential(
                tnn.Linear(512, 128), tnn.ReLU(), tnn.Linear(128, NUM_ACTIONS)
            )

        def forward(self, x):
            b, t, c, h, w = x.size()
            x = x.view(b * t, c, h, w)
            x = self.cnn2d(x)
            x = x.view(b, t, -1).permute(0, 2, 1)
            x = self.cnn1d(x)
            x = x.view(x.size(0), -1)
            return self.classifier(x)

    torch.manual_seed(11)
    module = tnn.Module()
    module.model = TorchSpatialStreamCNN()
    with torch.no_grad():
        _randomize_bn_stats(module)
    module.eval()
    return module


@pytest.fixture(scope="module")
def ckpt_path(tmp_path_factory):
    module = _make_reference_cnn()
    container = {
        "epoch": 7,
        "global_step": 4242,
        "pytorch-lightning_version": "1.9.0",
        "state_dict": module.state_dict(),
        "hyper_parameters": {"cfg": _CustomHParams(), "lr": 2e-4},
        "optimizer_states": [{}],
        "lr_schedulers": [],
    }
    path = str(tmp_path_factory.mktemp("ckpt") / "four-chars-test.ckpt")
    torch.save(container, path)
    return path, module


def test_loads_container_with_untrusted_objects(ckpt_path):
    path, module = ckpt_path
    ckpt = load_lightning_checkpoint(path)
    sd = extract_state_dict(ckpt)
    assert "model.cnn2d.conv1.weight" in sd
    ref = module.state_dict()["model.cnn2d.conv1.weight"].numpy()
    np.testing.assert_array_equal(np.asarray(sd["model.cnn2d.conv1.weight"]), ref)
    # The custom object did NOT require importing _CustomHParams' module —
    # it either round-tripped (weights_only path) or became a stub.
    assert "hyper_parameters" in ckpt


def test_convert_reference_checkpoint(ckpt_path):
    path, module = ckpt_path
    variables = convert_reference_checkpoint(path, "cnn", sequence_length=SEQ_LEN)
    assert "params" in variables and "batch_stats" in variables

    from playaid_core_tpu.models.cnn_action_detector import CNNActionDetector

    fmodel = CNNActionDetector(num_actions=NUM_ACTIONS, sequence_length=SEQ_LEN)
    x = np.random.default_rng(3).uniform(size=(2, SEQ_LEN, 48, 48, 3)).astype(np.float32)
    with torch.no_grad():
        t_logits = module.model(torch.from_numpy(x.transpose(0, 1, 4, 2, 3)))
        t_logp = torch.log_softmax(t_logits, dim=1).numpy()
    f_logp = np.asarray(fmodel.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(f_logp, t_logp, rtol=3e-3, atol=3e-3)


def test_pipeline_bridge_end_to_end(ckpt_path):
    """.ckpt -> BatchedActionPipeline variables -> embed parity vs torch."""
    path, module = ckpt_path
    from playaid_core_tpu.infer.pipeline import BatchedActionPipeline

    pipe = BatchedActionPipeline(family="cnn", num_actions=NUM_ACTIONS,
                                 sequence_length=SEQ_LEN, crop_size=48)
    variables = load_pipeline_from_ckpt(pipe, path)
    crops = np.random.default_rng(5).uniform(size=(4, 48, 48, 3)).astype(np.float32)
    emb = np.asarray(pipe.embed_crops(variables, jnp.asarray(crops)))
    with torch.no_grad():
        t_emb = module.model.cnn2d(
            torch.from_numpy(crops.transpose(0, 3, 1, 2))
        ).numpy()
    np.testing.assert_allclose(emb, t_emb, rtol=3e-3, atol=3e-3)


def test_malicious_pickle_does_not_execute(tmp_path):
    """A crafted container reducing through builtins.eval / os.system must
    load as inert stubs, never execute (ADVICE r2: a module-prefix
    allowlist containing 'builtins' would resolve eval via GLOBAL+REDUCE)."""
    import pickle

    flag = tmp_path / "pwned"

    class Evil:
        def __reduce__(self):
            return (eval, (f"open({str(flag)!r}, 'w').write('x')",))

    class EvilGetattr:
        def __reduce__(self):
            # getattr(builtins, 'eval') ladder — defeats name-only filters.
            return (getattr, (__builtins__, "eval"))

    path = tmp_path / "evil.ckpt"
    with open(path, "wb") as f:
        pickle.dump({"state_dict": {"w": Evil()}, "h": EvilGetattr()}, f)

    from playaid_core_tpu.models.lightning_ckpt import _RestrictedPickleModule

    with open(path, "rb") as f:
        loaded = _RestrictedPickleModule.load(f)
    assert not flag.exists(), "restricted unpickler executed attacker code"
    assert repr(loaded["state_dict"]["w"]) == "<ckpt stub>"
    assert repr(loaded["h"]) == "<ckpt stub>"


def test_torch_load_path_rejects_malicious_zip(tmp_path):
    """Same attack through the real torch.save container format + the
    public load_lightning_checkpoint entry point."""
    import torch as _torch

    flag = tmp_path / "pwned2"

    class Evil:
        def __reduce__(self):
            return (eval, (f"open({str(flag)!r}, 'w').write('x')",))

    path = str(tmp_path / "evil2.ckpt")
    _torch.save({"state_dict": {"w": _torch.zeros(2), "e": Evil()}}, path)
    ckpt = load_lightning_checkpoint(path)
    assert not flag.exists(), "load_lightning_checkpoint executed attacker code"
    sd = extract_state_dict(ckpt)
    np.testing.assert_array_equal(np.asarray(sd["w"]), np.zeros(2, np.float32))
    assert repr(sd["e"]) == "<ckpt stub>"
