"""Numerical parity between torch reference architectures and the Flax
rebuilds under converted weights.

A minimal torch ResNet-18 with torchvision's exact structure/naming and
the reference's CNN temporal head (reference:
models/cnn_action_detector.py:13-43) are instantiated with random
weights, converted via models/torch_convert, and compared logit-for-logit
against the Flax models in eval mode.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from playaid_core_tpu.models.resnet import make_resnet  # noqa: E402
from playaid_core_tpu.models.torch_convert import (  # noqa: E402
    convert_cnn_action_detector,
    convert_resnet_state_dict,
    convert_temporal_conv1d,
)


pytestmark = pytest.mark.slow  # model-compile-heavy; -m 'not slow' skips


class TorchBasicBlock(tnn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.relu = tnn.ReLU(inplace=True)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet18(tnn.Module):
    """torchvision-structure ResNet-18 (param names layerN.M.convK etc.)."""

    def __init__(self, num_classes=1000):
        super().__init__()
        self.inplanes = 64
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(64, 2, 1)
        self.layer2 = self._make_layer(128, 2, 2)
        self.layer3 = self._make_layer(256, 2, 2)
        self.layer4 = self._make_layer(512, 2, 2)
        self.avgpool = tnn.AdaptiveAvgPool2d((1, 1))
        self.fc = tnn.Linear(512, num_classes)

    def _make_layer(self, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes:
            downsample = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes),
            )
        layers = [TorchBasicBlock(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes
        for _ in range(1, blocks):
            layers.append(TorchBasicBlock(planes, planes))
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.avgpool(x).flatten(1)
        return self.fc(x)


def _randomize_bn_stats(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)


def test_resnet18_converted_weights_match_torch():
    torch.manual_seed(0)
    tmodel = TorchResNet18()
    with torch.no_grad():
        _randomize_bn_stats(tmodel)
    tmodel.eval()

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params, stats = convert_resnet_state_dict(sd, [2, 2, 2, 2], bottleneck=False)

    fmodel = make_resnet("resnet18", num_classes=1000)
    x = np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    f_out = np.asarray(
        fmodel.apply({"params": params, "batch_stats": stats}, jnp.asarray(x), train=False)
    )
    np.testing.assert_allclose(f_out, t_out, rtol=2e-3, atol=2e-3)


def test_temporal_conv1d_conversion():
    torch.manual_seed(1)
    t, f, h = 4, 16, 8
    conv = tnn.Conv1d(f, h, kernel_size=t)
    x = torch.randn(3, f, t)
    with torch.no_grad():
        t_out = conv(x).squeeze(-1).numpy()  # [3, H]

    kernel, bias = convert_temporal_conv1d(
        conv.weight.detach().numpy(), conv.bias.detach().numpy()
    )
    # Flax consumes t-major flattened [B, T*F] of features [B, T, F].
    feats = x.numpy().transpose(0, 2, 1).reshape(3, t * f)
    f_out = feats @ kernel + bias
    np.testing.assert_allclose(f_out, t_out, rtol=1e-5, atol=1e-5)


def test_cnn_action_detector_full_conversion():
    """Full reference CNNActionDetector graph vs the Flax rebuild."""
    torch.manual_seed(2)
    num_actions, seq_len = 6, 3

    class TorchSpatialStreamCNN(tnn.Module):
        # Mirrors reference models/cnn_action_detector.py:13-43.
        def __init__(self):
            super().__init__()
            self.cnn2d = TorchResNet18(num_classes=1000)
            self.cnn1d = tnn.Sequential(
                tnn.Conv1d(1000, 512, kernel_size=seq_len, stride=1), tnn.ReLU()
            )
            self.classifier = tnn.Sequential(
                tnn.Linear(512, 128), tnn.ReLU(), tnn.Linear(128, num_actions)
            )

        def forward(self, x):
            b, t, c, h, w = x.size()
            x = x.view(b * t, c, h, w)
            x = self.cnn2d(x)
            x = x.view(b, t, -1).permute(0, 2, 1)
            x = self.cnn1d(x)
            x = x.view(x.size(0), -1)
            return self.classifier(x)

    tmodel = tnn.Module()
    tmodel.model = TorchSpatialStreamCNN()
    with torch.no_grad():
        _randomize_bn_stats(tmodel)
    tmodel.eval()

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_cnn_action_detector(sd, sequence_length=seq_len)

    from playaid_core_tpu.models.cnn_action_detector import CNNActionDetector

    fmodel = CNNActionDetector(num_actions=num_actions, sequence_length=seq_len)
    x = np.random.default_rng(1).uniform(size=(2, seq_len, 48, 48, 3)).astype(np.float32)

    with torch.no_grad():
        t_logits = tmodel.model(torch.from_numpy(x.transpose(0, 1, 4, 2, 3))).numpy()
        t_logp = torch.log_softmax(torch.from_numpy(t_logits), dim=1).numpy()

    # Structural check: converted tree matches the model's expected tree.
    expected = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(x))
    exp_paths = {
        "/".join(str(getattr(p, "key", p)) for p in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(expected["params"])[0]
    }
    got_paths = {
        "/".join(str(getattr(p, "key", p)) for p in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    }
    assert exp_paths == got_paths, exp_paths ^ got_paths

    f_logp = np.asarray(fmodel.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(f_logp, t_logp, rtol=3e-3, atol=3e-3)
