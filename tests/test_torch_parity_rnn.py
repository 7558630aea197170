"""Converted-weight parity for the RNN family: inline torch
resnet18 + LSTM + decoder vs the Flax rebuild.

torch side uses batch_first=True; the reference omitted it
(models/rnn_action_detector.py:61,:88) so its recurrence ran across the
batch — a quirk deliberately not replicated (docs/PARITY.md).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from playaid_core_tpu.models.rnn_action_detector import RNNActionDetector  # noqa: E402
from playaid_core_tpu.models.torch_convert import (  # noqa: E402
    convert_lstm,
    convert_rnn_action_detector,
)
from tests.test_torch_parity import TorchResNet18, _randomize_bn_stats  # noqa: E402


pytestmark = pytest.mark.slow  # model-compile-heavy; -m 'not slow' skips


def test_lstm_conversion_matches_torch():
    torch.manual_seed(0)
    torch_lstm = tnn.LSTM(input_size=6, hidden_size=5, num_layers=2, batch_first=True)
    sd = {f"lstm.{k}": v.numpy() for k, v in torch_lstm.state_dict().items()}
    params = convert_lstm(sd, "lstm", 2)

    import flax.linen as fnn
    import jax

    from playaid_core_tpu.models.rnn_action_detector import StackedLSTM

    model = StackedLSTM(hidden_size=5, num_layers=2)
    x = np.random.default_rng(0).normal(size=(3, 7, 6)).astype(np.float32)
    with torch.no_grad():
        t_out, _ = torch_lstm(torch.from_numpy(x))
    f_out = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(f_out), t_out.numpy(), rtol=1e-4, atol=1e-5)


def test_rnn_detector_converted_weights_match_torch():
    torch.manual_seed(1)
    num_actions, seq_len = 6, 4

    class TorchRNNDetector(tnn.Module):
        # Mirrors reference models/rnn_action_detector.py:53-95 with
        # batch_first recurrence.
        def __init__(self):
            super().__init__()
            self.resnet = TorchResNet18(num_classes=1000)
            self.resnet.fc = tnn.Sequential(tnn.Linear(512, 300))
            self.lstm = tnn.LSTM(input_size=300, hidden_size=512, num_layers=3,
                                 batch_first=True)
            self.action_decoder = tnn.Sequential(
                tnn.Linear(512, 128), tnn.ReLU(), tnn.Linear(128, num_actions)
            )

        def forward(self, x):
            b, t, c, h, w = x.shape
            feats = self.resnet(x.reshape(b * t, c, h, w)).reshape(b, t, -1)
            hidden, _ = self.lstm(feats)
            logits = self.action_decoder(hidden.reshape(b * t, -1))
            return torch.log_softmax(logits, dim=1)

    tmodel = TorchRNNDetector()
    with torch.no_grad():
        _randomize_bn_stats(tmodel)
    tmodel.eval()

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_rnn_action_detector(sd)

    fmodel = RNNActionDetector(num_actions=num_actions)
    x = np.random.default_rng(2).uniform(size=(2, seq_len, 48, 48, 3)).astype(np.float32)

    with torch.no_grad():
        t_logp = tmodel(torch.from_numpy(x.transpose(0, 1, 4, 2, 3))).numpy()
    f_logp = np.asarray(fmodel.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(f_logp, t_logp, rtol=5e-3, atol=5e-3)
