"""Model evaluation dashboards.

Rebuild of the reference streamlit eval apps (reference:
visualizations/{cnn,rnn,resnet_transformer}_action_detector_vis.py):
sample dataset items, run a checkpointed model, show per-frame strips with
✅/❌ captions, accuracy / mean-confidence aggregates, and a confusion
matrix.

Backends:
* default — a self-contained static HTML report (no server, no extra
  deps), written to disk with the frame strips inlined as base64 PNGs;
* ``streamlit`` — when the package is installed, the same render
  functions drive a live app (reference behavior).
"""

from __future__ import annotations

import base64
import html
import io
import os

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _png_b64(img_u8):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img_u8).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def confusion_matrix_image(labels, preds, num_classes):
    """Confusion-matrix heatmap as an RGBA array (reference:
    visualizations/cnn_action_detector_vis.py:30-45, un-commented)."""
    cm = np.zeros((num_classes, num_classes), np.int64)
    for l, p in zip(labels, preds):
        cm[l, p] += 1
    fig, ax = plt.subplots(figsize=(8, 6), dpi=100)
    im = ax.imshow(cm, cmap="viridis")
    ax.set_xlabel("Predicted")
    ax.set_ylabel("Actual")
    fig.colorbar(im)
    fig.canvas.draw()
    out = np.asarray(fig.canvas.buffer_rgba()).copy()
    plt.close(fig)
    return out


def write_training_report(metrics_jsonl, out_path):
    """Static HTML training-curves report from a Trainer metrics JSONL:
    loss/accuracy curves plus the gradient-observability channel
    (grad-norm / param-norm — the reference watched gradients through
    wandb.watch, reference: action_detector.py:63-65) and the train
    throughput (steps/s) the loop records per epoch."""
    import json

    records = []
    with open(metrics_jsonl) as f:
        for line in f:
            line = line.strip()
            if line:
                records.append(json.loads(line))
    if not records:
        raise ValueError(f"no records in {metrics_jsonl}")
    epochs = [r.get("epoch", i) for i, r in enumerate(records)]

    panels = [
        ("loss", ["train_loss", "val_loss"]),
        ("accuracy", ["train_acc", "val_acc"]),
        ("gradient/param norms", ["grad_norm", "param_norm"]),
        ("throughput (steps/s)", ["steps_per_sec"]),
    ]
    parts = ["<html><head><title>Training report</title></head><body>",
             f"<h1>Training report</h1><p>{html.escape(str(metrics_jsonl))} "
             f"&mdash; {len(records)} epochs</p>"]
    for title, keys in panels:
        present = [k for k in keys if any(k in r for r in records)]
        if not present:
            continue
        fig, ax = plt.subplots(figsize=(7, 3), dpi=100)
        for k in present:
            ys = [r.get(k) for r in records]
            xs = [e for e, y in zip(epochs, ys) if y is not None]
            ax.plot(xs, [y for y in ys if y is not None], label=k)
        ax.set_title(title, fontsize=10)
        ax.set_xlabel("epoch", fontsize=8)
        ax.legend(fontsize=8)
        ax.tick_params(labelsize=7)
        fig.tight_layout()
        fig.canvas.draw()
        img = np.asarray(fig.canvas.buffer_rgba())[:, :, :3].copy()
        plt.close(fig)
        parts.append(f"<h2>{html.escape(title)}</h2>"
                     f"<img src='data:image/png;base64,{_png_b64(img)}'>")
    parts.append("</body></html>")
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "w") as f:
        f.write("\n".join(parts))
    return out_path


def evaluate_samples(model_apply, dataset, total=16, center_supervised=True):
    """Run a model over dataset samples; returns per-sample records plus
    aggregates (the de-facto eval harness the reference ran in streamlit,
    reference: visualizations/cnn_action_detector_vis.py:90-148)."""
    records = []
    labels, preds, confidences = [], [], []
    num_correct = 0
    actions = dataset.animations
    for i in range(total):
        frames, char_id, action_label, meta = dataset[i]
        center = frames.shape[0] // 2
        log_probs = np.asarray(model_apply(jnp.asarray(frames)[None]))
        flat = log_probs.reshape(-1, log_probs.shape[-1])
        if center_supervised and flat.shape[0] == 1:
            frame_logp = flat[0]
        else:
            frame_logp = flat[min(center, flat.shape[0] - 1)]
        predicted_id = int(np.argmax(frame_logp))
        confidence = float(np.exp(frame_logp[predicted_id])) * 100.0

        gt_id = int(action_label[center])
        is_accurate = predicted_id == gt_id
        num_correct += is_accurate
        labels.append(gt_id)
        preds.append(predicted_id)
        confidences.append(confidence)
        caption = f"{'✅' if is_accurate else '❌'} Pred: {actions[predicted_id]} "
        caption += f"{confidence:.2f}%"
        if not is_accurate:
            caption += f" | GT: {actions[gt_id]}"
        records.append(
            {
                "frames": (frames * 255).astype(np.uint8),
                "caption": caption,
                "correct": is_accurate,
                "confidence": confidence,
                "meta": {k: v for k, v in meta.items() if k != "frames"},
            }
        )
    aggregates = {
        "total": total,
        "accuracy": num_correct / float(total),
        "mean_confidence": float(np.mean(confidences)) if confidences else 0.0,
        "labels": labels,
        "preds": preds,
    }
    return records, aggregates


def write_html_report(path, records, aggregates, actions, title="Action model eval"):
    """Static HTML dashboard with inline frame strips + confusion matrix."""
    cm_img = confusion_matrix_image(
        aggregates["labels"], aggregates["preds"], len(actions)
    )
    parts = [
        "<html><head><meta charset='utf-8'>",
        "<style>body{font-family:sans-serif;background:#111;color:#eee}"
        ".strip img{height:128px;margin:2px}"
        ".ok{color:#7c7}.bad{color:#e77}</style>",
        f"<title>{html.escape(title)}</title></head><body>",
        f"<h1>{html.escape(title)}</h1>",
        f"<p>{aggregates['total']} samples | "
        f"accuracy {aggregates['accuracy']:.2%} | "
        f"mean confidence {aggregates['mean_confidence']:.2f}%</p>",
    ]
    for rec in records:
        cls = "ok" if rec["correct"] else "bad"
        parts.append(f"<div class='strip'><p class='{cls}'>{html.escape(rec['caption'])}</p>")
        for frame in rec["frames"]:
            parts.append(f"<img src='data:image/png;base64,{_png_b64(frame)}'>")
        parts.append("</div><hr>")
    parts.append("<h2>Confusion matrix</h2>")
    parts.append(f"<img src='data:image/png;base64,{_png_b64(cm_img[:, :, :3])}'>")
    parts.append("</body></html>")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(parts))
    return path


def streamlit_app(model_apply, dataset, total=16):
    """Live dashboard when streamlit is installed (reference behavior)."""
    import streamlit as st

    records, aggregates = evaluate_samples(model_apply, dataset, total)
    st.title("Action model eval")
    for rec in records:
        st.image(list(rec["frames"]), caption=[rec["caption"]] + [" "] *
                 (len(rec["frames"]) - 1), width=200, clamp=True)
        st.write("-" * 80)
    st.write(f"% correct: {aggregates['accuracy']:.2f}")
    st.write(f"mean confidence: {aggregates['mean_confidence']:.2f}")
    st.image(confusion_matrix_image(aggregates["labels"], aggregates["preds"],
                                    len(dataset.animations)))
