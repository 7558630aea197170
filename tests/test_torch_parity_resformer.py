"""Converted-weight parity for the ResFormer flagship: inline torch
ResNet-50 + nn.TransformerEncoder vs the Flax rebuild.

The torch side uses batch_first=True: the reference omitted it
(models/resnet_transformer_detector.py:51-58), making its attention mix
across batch samples instead of time — a quirk deliberately not
replicated (see docs/PARITY.md).  This test validates the weight mapping
under the corrected semantics.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from playaid_core_tpu.models.resnet_transformer import ResnetTransformerDetector  # noqa: E402
from playaid_core_tpu.models.torch_convert import convert_resformer_detector  # noqa: E402


pytestmark = pytest.mark.slow  # model-compile-heavy; -m 'not slow' skips


class TorchBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet50Features(tnn.Module):
    """timm-style resnet50 with num_classes=0 (pooled 2048-d features)."""

    def __init__(self):
        super().__init__()
        self.inplanes = 64
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(64, 3, 1)
        self.layer2 = self._make_layer(128, 4, 2)
        self.layer3 = self._make_layer(256, 6, 2)
        self.layer4 = self._make_layer(512, 3, 2)
        self.avgpool = tnn.AdaptiveAvgPool2d((1, 1))

    def _make_layer(self, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )
        layers = [TorchBottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        for _ in range(1, blocks):
            layers.append(TorchBottleneck(self.inplanes, planes))
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return self.avgpool(x).flatten(1)


class TorchResFormer(tnn.Module):
    """Reference ResFormer graph with batch_first attention (see module
    docstring)."""

    def __init__(self, num_actions, sequence_length, hidden_dim=247, num_heads=8,
                 num_layers=3):
        super().__init__()
        self.resnet = TorchResNet50Features()
        self.resnet_ffn = tnn.Linear(2048, hidden_dim)
        freq = self._time_encoding(
            torch.linspace(0, 1, sequence_length).reshape(-1, 1), 4
        )
        self.register_buffer("freq_encoding", freq)
        d_model = hidden_dim + freq.shape[1]
        layer = tnn.TransformerEncoderLayer(
            d_model=d_model, nhead=num_heads, batch_first=True
        )
        self.transformer = tnn.TransformerEncoder(layer, num_layers=num_layers)
        self.classifier = tnn.Linear(d_model, num_actions)

    @staticmethod
    def _time_encoding(x, num_freq):
        out = [x]
        for i in range(num_freq):
            out.extend((torch.cos(torch.pi * x * (2**i)), torch.sin(torch.pi * x * (2**i))))
        return torch.cat(out, dim=1)

    def forward(self, frames):
        b, s, c, h, w = frames.shape
        x = frames.reshape(b * s, c, h, w)
        feats = self.resnet_ffn(self.resnet(x)).reshape(b, s, -1)
        freq = self.freq_encoding.unsqueeze(0).expand(b, -1, -1)
        y = torch.cat([feats, freq], dim=2)
        y = self.transformer(y)
        return self.classifier(y)


def _randomize_bn_stats(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)


def test_resformer_converted_weights_match_torch():
    torch.manual_seed(0)
    num_actions, seq_len = 7, 3
    holder = tnn.Module()
    holder.model = TorchResFormer(num_actions, seq_len)
    with torch.no_grad():
        _randomize_bn_stats(holder)
    holder.eval()

    sd = {k: v.numpy() for k, v in holder.state_dict().items()}
    variables = convert_resformer_detector(sd)

    fmodel = ResnetTransformerDetector(num_actions=num_actions, sequence_length=seq_len)
    x = np.random.default_rng(0).uniform(size=(2, seq_len, 48, 48, 3)).astype(np.float32)

    with torch.no_grad():
        t_logits = holder.model(torch.from_numpy(x.transpose(0, 1, 4, 2, 3)))
        t_logp = torch.log_softmax(t_logits, dim=2).numpy()

    f_logp = np.asarray(fmodel.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(f_logp, t_logp, rtol=5e-3, atol=5e-3)
