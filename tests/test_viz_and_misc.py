import os

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_stage_timer():
    from playaid_core_tpu.profiling import StageTimer

    t = StageTimer()
    with t.stage("decode"):
        pass
    t.add("infer", 0.5)
    s = t.summary()
    assert s["infer"]["total_s"] == 0.5
    assert s["decode"]["count"] == 1
    assert "decode" in t.report()


def test_char_loader(tmp_path):
    from playaid_core_tpu.char_loader import (
        CHAR_INPUT_SIZE,
        CharacterLoader,
        crop_stock_info,
        dataframe_from_directory,
    )

    rng = np.random.default_rng(0)
    for label in ("fox", "marth"):
        d = tmp_path / label
        d.mkdir()
        for i in range(3):
            cv2.imwrite(str(d / f"{i}.jpg"),
                        rng.integers(0, 255, (720, 1280, 3), dtype=np.uint8))
    df = dataframe_from_directory(str(tmp_path))
    assert len(df) == 6
    loader = CharacterLoader(df, seed=0)
    feature, label = loader[0]
    assert feature.shape == (CHAR_INPUT_SIZE[1], CHAR_INPUT_SIZE[0], 3)
    assert label in ("fox", "marth")

    frame = np.zeros((720, 1280, 3), np.uint8)
    strip = crop_stock_info(frame)
    assert strip.shape == (CHAR_INPUT_SIZE[1], CHAR_INPUT_SIZE[0], 3)


def test_eval_dashboard_html_report(tmp_path):
    from playaid_core_tpu.viz.eval_dashboard import evaluate_samples, write_html_report

    actions = ["A", "B", "C"]

    class FakeDataset:
        animations = actions

        def __getitem__(self, idx):
            rng = np.random.default_rng(idx)
            frames = rng.uniform(size=(3, 16, 16, 3)).astype(np.float32)
            labels = np.array([idx % 3] * 3, np.int32)
            return frames, np.int32(0), labels, {"char": "Byleth", "actions": ["A"] * 3}

    def fake_apply(frames):
        # Always predict class 1.
        logits = jnp.full((1, 3, 3), -5.0).at[:, :, 1].set(0.0)
        return jax.nn.log_softmax(logits, axis=-1)

    records, agg = evaluate_samples(fake_apply, FakeDataset(), total=6,
                                    center_supervised=False)
    assert agg["total"] == 6
    # Predicting class 1 always: correct for idx % 3 == 1 -> 2 of 6.
    assert abs(agg["accuracy"] - 2 / 6) < 1e-9

    path = write_html_report(str(tmp_path / "report.html"), records, agg, actions)
    content = open(path).read()
    assert "accuracy" in content
    assert "data:image/png;base64" in content
    assert content.count("<div class='strip'>") == 6


def test_eval_dashboard_streamlit_backend_smoke(monkeypatch):
    """Exercise the streamlit backend's real code path with a recording
    stub (streamlit itself is not in this image): every render call the
    dashboard makes must land, with the accuracy line present."""
    import sys
    import types

    calls = []
    st = types.ModuleType("streamlit")
    st.title = lambda *a, **k: calls.append(("title", a))
    st.image = lambda *a, **k: calls.append(("image", a))
    st.write = lambda *a, **k: calls.append(("write", a))
    monkeypatch.setitem(sys.modules, "streamlit", st)

    from playaid_core_tpu.viz.eval_dashboard import streamlit_app

    actions = ["A", "B", "C"]

    class FakeDataset:
        animations = actions

        def __getitem__(self, idx):
            rng = np.random.default_rng(idx)
            frames = rng.uniform(size=(3, 16, 16, 3)).astype(np.float32)
            labels = np.array([idx % 3] * 3, np.int32)
            return frames, np.int32(0), labels, {"char": "Byleth", "actions": ["A"] * 3}

    def fake_apply(frames):
        logits = jnp.full((1, 3, 3), -5.0).at[:, :, 1].set(0.0)
        return jax.nn.log_softmax(logits, axis=-1)

    streamlit_app(fake_apply, FakeDataset(), total=4)
    kinds = [k for k, _ in calls]
    assert kinds.count("title") == 1
    assert kinds.count("image") == 4 + 1  # per-sample strips + confusion matrix
    writes = " ".join(str(a) for k, a in calls if k == "write")
    assert "% correct" in writes


def test_confusion_matrix_image():
    from playaid_core_tpu.viz.eval_dashboard import confusion_matrix_image

    img = confusion_matrix_image([0, 1, 2, 1], [0, 1, 1, 1], 3)
    assert img.ndim == 3 and img.shape[2] == 4


def test_profiler_trace(tmp_path):
    from playaid_core_tpu.profiling import annotate_stage, trace

    with trace(str(tmp_path / "trace")):
        with annotate_stage("stage1"):
            jnp.ones((8, 8)).block_until_ready()
    # Trace directory populated.
    found = []
    for root, dirs, files in os.walk(tmp_path / "trace"):
        found.extend(files)
    assert found


def test_training_report(tmp_path):
    """write_training_report renders loss/acc/grad-norm/throughput panels
    from a Trainer metrics JSONL."""
    import json

    from playaid_core_tpu.viz.eval_dashboard import write_training_report

    path = tmp_path / "metrics.jsonl"
    with open(path, "w") as f:
        for e in range(5):
            f.write(json.dumps({
                "epoch": e, "train_loss": 2.0 - 0.3 * e, "train_acc": 0.2 * e,
                "grad_norm": 1.0 / (e + 1), "param_norm": 50.0 + e,
                "steps_per_sec": 40 + e, "val_loss": 2.1 - 0.3 * e,
            }) + "\n")
    out = write_training_report(str(path), str(tmp_path / "report.html"))
    content = open(out).read()
    assert content.count("data:image/png;base64") == 4
    assert "gradient/param norms" in content
