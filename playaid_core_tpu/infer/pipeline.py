"""Batched two-fighter action-recognition pipeline.

The reference's inference hot loop ran batch-1: for every (fighter, frame)
it re-read 7 crop JPEGs from disk, re-ran the ResNet on all 7, and
classified one window (reference: ai_runner.py:426-520) — so every crop's
ResNet features were recomputed ~7 times across overlapping windows.

The TPU-native formulation factors the computation:

1. **Embed once**: every crop goes through the ResNet trunk exactly once,
   in large batches ([B*T fused] on the MXU, bf16);
2. **Window gather**: middle-out windows are gathered over the *embedding*
   sequence (cheap [N, T, D] gather on device), reproducing the
   reference's window sampling exactly (clamped quadratic offsets);
3. **Temporal head**: the CNN family's Conv1d+MLP head (or the ResFormer's
   transformer) runs on the gathered windows.

For the CNN and ResFormer families this is mathematically identical to
the reference computation (their frame encoders are per-frame pure
functions), just ~T times cheaper.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from playaid_core_tpu.models.resnet import make_resnet
from playaid_core_tpu.models.resnet_transformer import TransformerEncoderLayer, time_encoding
from playaid_core_tpu.ops.preprocess import (
    batched_square_crop_resize,
    middle_out_frame_indices,
)

import numpy as np


class CNNEmbed(nn.Module):
    """ResNet-18 trunk of the CNN family (produces the 1000-d per-frame
    feature the temporal head consumes)."""

    resnet_features: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, crops, train: bool = False):
        return make_resnet("resnet18", num_classes=self.resnet_features, dtype=self.dtype,
                           name="cnn2d")(crops, train=train)


class CNNTemporalHead(nn.Module):
    """Conv1d(kernel=T) + MLP head over a window of embeddings, log-probs
    out (matches SpatialStreamCNN's tail, reference:
    models/cnn_action_detector.py:22-43)."""

    num_actions: int
    sequence_length: int
    resnet_features: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, window_feats):
        b = window_feats.shape[0]
        y = window_feats.reshape(b, self.sequence_length * self.resnet_features)
        y = nn.Dense(512, dtype=self.dtype, name="temporal_dense")(y)
        y = nn.relu(y)
        y = nn.Dense(128, dtype=self.dtype, name="mlp_hidden")(y)
        y = nn.relu(y)
        y = nn.Dense(self.num_actions, dtype=self.dtype, name="classifier")(y)
        return jax.nn.log_softmax(y.astype(jnp.float32), axis=1)


class ResFormerEmbed(nn.Module):
    """ResNet-50 trunk + 247-d projection of the ResFormer family."""

    hidden_dim: int = 247
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, crops, train: bool = False):
        feats = make_resnet("resnet50", num_classes=0, dtype=self.dtype)(crops, train=train)
        return nn.Dense(self.hidden_dim, dtype=self.dtype, name="resnet_ffn")(feats)


class ResFormerTemporalHead(nn.Module):
    """Time-encoding concat + transformer + per-step classifier."""

    num_actions: int
    sequence_length: int = 7
    hidden_dim: int = 247
    num_heads: int = 8
    num_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, window_feats, train: bool = False):
        b = window_feats.shape[0]
        freq = time_encoding(
            np.linspace(0, 1, self.sequence_length).reshape(-1, 1), 4
        ).astype(np.float32)
        freq_b = jnp.broadcast_to(jnp.asarray(freq), (b,) + freq.shape)
        y = jnp.concatenate([window_feats, freq_b.astype(window_feats.dtype)], axis=2)
        d_model = self.hidden_dim + freq.shape[1]
        for i in range(self.num_layers):
            y = TransformerEncoderLayer(
                d_model, self.num_heads, dtype=self.dtype, name=f"layer_{i}"
            )(y, train=train)
        logits = nn.Dense(self.num_actions, dtype=self.dtype, name="classifier")(y)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=2)


class RNNEmbed(nn.Module):
    """ResNet-18 trunk + 300-d projection of the RNN family
    (reference: models/rnn_action_detector.py:53-54)."""

    encoder_features: int = 300
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, crops, train: bool = False):
        feats = make_resnet("resnet18", num_classes=0, dtype=self.dtype)(crops, train=train)
        return nn.Dense(self.encoder_features, dtype=self.dtype, name="encoder_proj")(feats)


class RNNTemporalHead(nn.Module):
    """3-layer LSTM + MLP decoder over a window of embeddings, per-step
    log-probs out (reference: models/rnn_action_detector.py:61-95)."""

    num_actions: int
    hidden_size: int = 512
    num_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, window_feats):
        from playaid_core_tpu.models.rnn_action_detector import StackedLSTM

        b, t = window_feats.shape[0], window_feats.shape[1]
        hidden = StackedLSTM(self.hidden_size, self.num_layers, name="lstm")(window_feats)
        y = hidden.reshape(b * t, self.hidden_size)
        y = nn.Dense(128, dtype=self.dtype, name="decoder_hidden")(y)
        y = nn.relu(y)
        y = nn.Dense(self.num_actions, dtype=self.dtype, name="decoder_out")(y)
        return jax.nn.log_softmax(y.astype(jnp.float32), axis=1).reshape(
            b, t, self.num_actions
        )


class BatchedActionPipeline:
    """Fused preprocess -> embed-once -> window-gather -> classify.

    Holds jitted stage functions; weights live in a params pytree compatible
    with the monolithic model modules (so trained checkpoints transfer).
    """

    def __init__(self, family="cnn", num_actions=63, sequence_length=7, frame_delta=3,
                 crop_size=128, dtype=jnp.float32):
        assert family in ("cnn", "resformer", "rnn")
        self.family = family
        self.num_actions = num_actions
        self.sequence_length = sequence_length
        self.frame_delta = frame_delta
        self.crop_size = crop_size
        self.dtype = dtype
        if family == "cnn":
            self.embed = CNNEmbed(dtype=dtype)
            self.head = CNNTemporalHead(num_actions, sequence_length, dtype=dtype)
        elif family == "rnn":
            self.embed = RNNEmbed(dtype=dtype)
            self.head = RNNTemporalHead(num_actions, dtype=dtype)
        else:
            self.embed = ResFormerEmbed(dtype=dtype)
            self.head = ResFormerTemporalHead(num_actions, sequence_length, dtype=dtype)

        self._embed_jit = jax.jit(
            lambda v, crops: self.embed.apply(v, crops)
        )
        self._head_jit = jax.jit(self._head_apply)
        self._classify_jit = jax.jit(
            self._classify_impl,
            static_argnames=("min_frame", "smooth_radius", "decode"),
        )
        self._embed_windows_jit = jax.jit(self._embed_windows_impl)
        self._embed_crops_u8_jit = jax.jit(self._embed_crops_u8_impl)
        self._embed_crops_yuv_jit = jax.jit(self._embed_crops_yuv_impl)
        self._epilogue_jit = jax.jit(
            self._epilogue_impl, static_argnames=("n_last", "min_frame")
        )
        self._scatter_jit = jax.jit(self._scatter_impl, donate_argnums=0)
        self._classify_buffer_jit = jax.jit(
            self._classify_buffer_impl,
            static_argnames=("min_frame", "smooth_radius", "decode"),
        )

    def _head_apply(self, variables, windows):
        out = self.head.apply(variables, windows)
        if self.family in ("resformer", "rnn"):
            # Per-timestep output: take the center step's prediction for the
            # per-frame label, like consuming the window's middle frame.
            out = out[:, self.sequence_length // 2, :]
        return out

    @property
    def embed_dim(self):
        return {"cnn": 1000, "resformer": 247, "rnn": 300}[self.family]

    def init(self, rng):
        crops = jnp.zeros((1, self.crop_size, self.crop_size, 3), jnp.float32)
        embed_vars = self.embed.init(rng, crops)
        head_vars = self.head.init(
            rng, jnp.zeros((1, self.sequence_length, self.embed_dim))
        )
        return {"embed": embed_vars, "head": head_vars}

    def embed_crops(self, variables, crops):
        """crops [N, S, S, 3] float -> [N, D] embeddings."""
        return self._embed_jit(variables["embed"], crops)

    def _embed_windows_impl(self, embed_vars, wins_u8, origins):
        """Fused BGR->RGB + window-resize + normalize + embed: one device
        round-trip per chunk (remote dispatch latency matters through the
        TPU tunnel).  wins_u8 [M, W, W, 3] BGR uint8, origins [M, 3]."""
        from playaid_core_tpu.ops.preprocess import batched_window_resize

        crops = batched_window_resize(
            wins_u8[..., ::-1], origins[:, 0], origins[:, 1], origins[:, 2],
            out_size=self.crop_size,
        )
        return self.embed.apply(embed_vars, crops)

    def embed_windows(self, variables, wins_u8, origins):
        return self._embed_windows_jit(variables["embed"], wins_u8, origins)

    def _embed_crops_u8_impl(self, embed_vars, crops_u8):
        """Fused BGR->RGB + /255 + embed for host-resized uint8 crops."""
        crops = crops_u8[..., ::-1].astype(jnp.float32) / 255.0
        return self.embed.apply(embed_vars, crops)

    def embed_crops_u8(self, variables, crops_u8):
        return self._embed_crops_u8_jit(variables["embed"], crops_u8)

    def _embed_crops_yuv_impl(self, embed_vars, crops_yuv):
        """Fused YUV420->RGB + /255 + embed for packed planar uint8 crops
        ([N, S*S*3//2], Y then U then V — see NativeVideoDecoder
        fmt="yuv420").  Shipping 4:2:0 halves host->device bytes; the
        BT.601 limited-range conversion (what swscale/cv2 apply on the
        host) runs fused on device instead.
        """
        s = self.crop_size
        n = crops_yuv.shape[0]
        yb, cb = s * s, (s // 2) * (s // 2)
        y = crops_yuv[:, :yb].reshape(n, s, s).astype(jnp.float32)
        u = crops_yuv[:, yb : yb + cb].reshape(n, s // 2, s // 2).astype(jnp.float32)
        v = crops_yuv[:, yb + cb :].reshape(n, s // 2, s // 2).astype(jnp.float32)

        # Nearest 2x chroma upsample — deliberately matching the host
        # swscale unscaled YUV420->BGR converter (it replicates chroma
        # too; a phase-correct bilinear upsample was measured and does NOT
        # reduce the delta vs the bit-exact native BGR crops — the
        # residual ~0.8 mean is swscale's integer-coefficient rounding).
        u = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2)
        v = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2)
        yc = 1.164383 * (y - 16.0)
        r = yc + 1.596027 * (v - 128.0)
        g = yc - 0.391762 * (u - 128.0) - 0.812968 * (v - 128.0)
        b = yc + 2.017232 * (u - 128.0)
        rgb = jnp.stack([r, g, b], axis=-1)
        crops = jnp.clip(rgb, 0.0, 255.0) / 255.0
        return self.embed.apply(embed_vars, crops)

    def embed_crops_yuv(self, variables, crops_yuv):
        return self._embed_crops_yuv_jit(variables["embed"], crops_yuv)

    def _epilogue_impl(self, head_vars, emb_chunks, n_last, min_frame=0):
        """Chunk-tuple variant of the classification tail (kept for small
        batch counts / API compatibility; the VOD pipeline uses the
        constant-program buffer path)."""
        parts = list(emb_chunks[:-1])
        parts.append(emb_chunks[-1][: n_last * 2])
        emb_all = jnp.concatenate(parts, axis=0)
        f = emb_all.shape[0] // 2
        per_fighter = emb_all.reshape(f, 2, -1).astype(jnp.float32)
        return self._two_fighter_tail(head_vars, per_fighter, f, min_frame)

    def classify_chunked(self, variables, emb_chunks, n_last, min_frame=0):
        return self._epilogue_jit(
            variables["head"], tuple(emb_chunks), n_last, min_frame=min_frame
        )

    # ---- scalable accumulation path (VOD-length independent programs) ----

    # Embedding buffers round up to this many frames so VODs of any length
    # share one scatter and one classify program per bucket (remote
    # compiles are expensive — same reason classify_sequence buckets).
    BUFFER_BUCKET_FRAMES = 4096

    def _scatter_impl(self, buf, emb_chunk, row_offset):
        return jax.lax.dynamic_update_slice(
            buf, emb_chunk.astype(jnp.float32), (row_offset, 0)
        )

    def make_embedding_buffer(self, num_frames):
        """Preallocated interleaved [F_pad*2, D] device buffer.

        F_pad buckets to the next power of two below BUFFER_BUCKET_FRAMES
        and to BUFFER_BUCKET_FRAMES multiples above it, so the set of
        compiled scatter/classify programs is small and shared across VOD
        lengths without over-padding short clips."""
        cap = self.BUFFER_BUCKET_FRAMES
        if num_frames <= cap:
            f_pad = 1
            while f_pad < num_frames:
                f_pad *= 2
        else:
            f_pad = cap * ((num_frames + cap - 1) // cap)
        return jnp.zeros((f_pad * 2, self.embed_dim), jnp.float32)

    def scatter_embeddings(self, buf, emb_chunk, row_offset):
        """Write one chunk's [rows, D] embeddings at row_offset.  One
        compiled program per (buffer bucket, chunk size); the buffer is
        donated, so accumulation is in-place on device."""
        return self._scatter_jit(buf, emb_chunk, row_offset)

    @staticmethod
    def _smooth_log_probs(log_probs, true_len, radius):
        """Mean per-frame log-probs over frames [i-radius, i+radius]
        clamped to the true sequence — joint (geometric-mean) evidence
        over a temporal neighborhood.

        Actions persist for many frames while any single middle-out
        window sees only a fraction of a move's animation cycle, so
        per-window argmax is noisy exactly where move cycles share
        sub-windows (aerials, movement).  Pooling the window posteriors
        over a neighborhood disambiguates from the rest of the cycle.
        The reference classified each window independently
        (ai_runner.py:466-520)."""
        f = log_probs.shape[0]
        mask = (jnp.arange(f) < true_len)[:, None]
        lp = jnp.where(mask, log_probs, 0.0)
        csum = jnp.concatenate(
            [jnp.zeros((1, lp.shape[1]), lp.dtype), jnp.cumsum(lp, axis=0)],
            axis=0,
        )
        i = jnp.arange(f)
        lo = jnp.maximum(i - radius, 0)
        hi = jnp.minimum(i + radius, jnp.maximum(true_len - 1, 0))
        summed = jnp.take(csum, hi + 1, axis=0) - jnp.take(csum, lo, axis=0)
        count = jnp.maximum(hi + 1 - lo, 1).astype(lp.dtype)
        return summed / count[:, None]

    @staticmethod
    def _viterbi_decode(log_probs, true_len, switch_cost):
        """MAP label path under a uniform switching penalty (Potts prior).

        Boxcar pooling (``_smooth_log_probs``) blurs move boundaries by up
        to the pooling radius; Viterbi keeps the persistence prior (moves
        last many frames — a switch costs ``switch_cost`` nats) while
        letting the transition land exactly where the per-window evidence
        changes.  switch_cost ~ log(expected move duration in frames);
        4.0 matches ~55-frame moves.  Rows at/after ``true_len`` are
        frozen out of the recursion (the caller slices them off).
        """
        f, a = log_probs.shape
        valid = jnp.arange(f) < true_len
        lp = jnp.where(valid[:, None], log_probs, 0.0)
        if f == 1:
            return jnp.argmax(lp[0])[None]
        idx = jnp.arange(a)

        def fwd(carry, x):
            lp_t, v = x
            switch_from = jnp.argmax(carry)
            switch_score = carry[switch_from] - switch_cost
            take_stay = carry >= switch_score
            best = jnp.where(take_stay, carry, switch_score)
            ptr = jnp.where(take_stay, idx, switch_from)
            new = jnp.where(v, lp_t + best, carry)
            ptr = jnp.where(v, ptr, idx)
            return new, ptr

        delta_last, ptrs = jax.lax.scan(fwd, lp[0], (lp[1:], valid[1:]))
        last = jnp.argmax(delta_last)

        def bwd(carry, ptr_t):
            return ptr_t[carry], carry

        first, tail = jax.lax.scan(bwd, last, ptrs, reverse=True)
        return jnp.concatenate([first[None], tail])

    def _two_fighter_tail(self, head_vars, per_fighter, true_len, min_frame,
                          smooth_radius=0, decode="argmax", switch_cost=4.0):
        """Shared classification tail: middle-out windows over an
        interleaved [F, 2, D] embedding sequence -> (labels [F, 2],
        confidence [F, 2]).  ``true_len`` clamps windows so padding rows
        never feed real frames' windows."""
        f = per_fighter.shape[0]
        idx = middle_out_frame_indices(
            jnp.arange(f), self.sequence_length, self.frame_delta,
            jnp.maximum(true_len, 1), min_frame=min_frame,
        )  # [F, T]
        windows = jnp.take(per_fighter, idx, axis=0)  # [F, T, 2, D]
        windows = jnp.transpose(windows, (0, 2, 1, 3)).reshape(
            f * 2, self.sequence_length, -1
        )
        log_probs = self._head_apply(head_vars, windows)  # [F*2, A]
        if smooth_radius:
            lp = log_probs.reshape(f, 2, -1)
            lp = jnp.stack(
                [self._smooth_log_probs(lp[:, k], true_len, smooth_radius)
                 for k in range(2)],
                axis=1,
            )
            log_probs = lp.reshape(f * 2, -1)
        if decode == "viterbi":
            lp = log_probs.reshape(f, 2, -1)
            labels = jnp.stack(
                [self._viterbi_decode(lp[:, k], true_len, switch_cost)
                 for k in range(2)],
                axis=1,
            )
            conf = jnp.exp(jnp.take_along_axis(
                lp, labels[:, :, None], axis=2
            ))[:, :, 0] * 100.0
        else:
            labels = jnp.argmax(log_probs, axis=-1).reshape(f, 2)
            conf = (jnp.exp(jnp.max(log_probs, axis=-1)) * 100.0).reshape(f, 2)
        return labels, conf

    def _classify_buffer_impl(self, head_vars, buf, true_len, min_frame,
                              smooth_radius=0, decode="argmax", switch_cost=4.0):
        per_fighter = buf.reshape(buf.shape[0] // 2, 2, -1).astype(jnp.float32)
        return self._two_fighter_tail(head_vars, per_fighter, true_len, min_frame,
                                      smooth_radius=smooth_radius, decode=decode,
                                      switch_cost=switch_cost)

    def classify_buffer(self, variables, buf, true_len, min_frame=0,
                        smooth_radius=0, decode="argmax", switch_cost=4.0):
        labels, conf = self._classify_buffer_jit(
            variables["head"], buf, true_len, min_frame=min_frame,
            smooth_radius=smooth_radius, decode=decode,
            switch_cost=switch_cost,
        )
        return labels[:true_len], conf[:true_len]

    def classify_sequence(self, variables, embeddings, min_frame=0, pad_bucket=4096,
                          smooth_radius=0, decode="argmax", switch_cost=4.0,
                          return_raw=False):
        """embeddings [F, D] for consecutive frames -> per-frame
        (labels [F], confidence [F]) using middle-out windows.

        The sequence is zero-padded up to a bucket size so every call
        shares one compiled program regardless of VOD length (remote
        compiles are expensive); windows are built against the true length
        so padding never leaks into real frames' windows.

        ``smooth_radius`` > 0 pools the per-window log-posteriors over
        [i-r, i+r] before decoding (see _smooth_log_probs).
        ``decode="viterbi"`` decodes the MAP label path under a
        ``switch_cost``-nat switching penalty (see _viterbi_decode)
        instead of the per-frame argmax; both compose.

        ``return_raw=True`` additionally returns the pre-smoothing,
        pre-decode per-window argmax labels (labels, conf, raw) — from the
        SAME head forward, so capturing the raw view costs one extra
        argmax, not a second full classification pass.
        """
        f = embeddings.shape[0]
        if pad_bucket:
            padded = pad_bucket * ((f + pad_bucket - 1) // pad_bucket)
            if padded != f:
                embeddings = jnp.pad(embeddings, ((0, padded - f), (0, 0)))
        labels, conf, raw = self._classify_jit(
            variables["head"], embeddings, f, min_frame=min_frame,
            smooth_radius=smooth_radius, decode=decode,
            switch_cost=switch_cost,
        )
        if return_raw:
            return labels[:f], conf[:f], raw[:f]
        return labels[:f], conf[:f]

    def _classify_impl(self, head_vars, embeddings, true_len, min_frame,
                       smooth_radius=0, decode="argmax", switch_cost=4.0):
        f = embeddings.shape[0]
        idx = middle_out_frame_indices(
            jnp.arange(f), self.sequence_length, self.frame_delta,
            jnp.maximum(true_len, 1), min_frame=min_frame,
        )  # [F, T] clamped to the true length
        windows = jnp.take(embeddings, idx, axis=0)  # [F, T, D]
        log_probs = self._head_apply(head_vars, windows)
        raw_labels = jnp.argmax(log_probs, axis=-1)
        if smooth_radius:
            log_probs = self._smooth_log_probs(log_probs, true_len, smooth_radius)
        if decode == "viterbi":
            labels = self._viterbi_decode(log_probs, true_len, switch_cost)
            conf = jnp.exp(jnp.take_along_axis(
                log_probs, labels[:, None], axis=1
            ))[:, 0] * 100.0
        else:
            labels = jnp.argmax(log_probs, axis=-1)
            conf = jnp.exp(jnp.max(log_probs, axis=-1)) * 100.0
        return labels, conf, raw_labels

    def preprocess_frames(self, frames_u8, boxes, padding=30, use_pallas=None):
        """frames [B, H, W, 3] uint8 + boxes [B, 4] -> [B, S, S, 3] f32.

        Uses the Pallas kernel on TPU, the pure-JAX path elsewhere.
        """
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        if use_pallas:
            from playaid_core_tpu.ops.pallas_kernels import pallas_square_crop_resize

            h = frames_u8.shape[1]
            # Covers crop sides up to ~475 px (win_h - 34 / win_w - 130).
            win_h, win_w = (640, 768) if h > 800 else (512, 640)
            return pallas_square_crop_resize(
                frames_u8, boxes, out_size=self.crop_size, padding=padding,
                win_h=win_h, win_w=win_w, bgr_to_rgb=True,
            )
        return batched_square_crop_resize(
            frames_u8, boxes, out_size=self.crop_size, padding=padding, bgr_to_rgb=True
        )

    def load_checkpoint(self, path):
        """Restore a checkpoint into this pipeline's split {embed, head}
        trees.  Accepts either an orbax directory saved by the Trainer
        (params + batch_stats [+ opt_state]) or a reference Lightning
        ``.ckpt`` container (reference: ai_runner.py:164-168), which is
        converted through the logit-parity-tested torch bridges."""
        import os

        if str(path).endswith(".ckpt"):
            from playaid_core_tpu.models.lightning_ckpt import load_pipeline_from_ckpt

            return load_pipeline_from_ckpt(self, path)

        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(os.path.abspath(path))
        return self.from_monolithic(
            {"params": restored["params"], "batch_stats": restored.get("batch_stats")}
        )

    def from_monolithic(self, variables):
        """Map a trained monolithic model checkpoint
        (:mod:`playaid_core_tpu.models` / :mod:`playaid_core_tpu.train`)
        into this pipeline's split {embed, head} variable trees, so VOD
        inference runs with trained weights unchanged."""
        params = variables["params"]
        stats = variables.get("batch_stats") or {}
        if self.family == "cnn":
            inner_p = params["model"]
            inner_s = stats.get("model", {})
            embed = {
                "params": {"cnn2d": inner_p["ResNet_0"]},
                "batch_stats": {"cnn2d": inner_s.get("ResNet_0", {})},
            }
            head = {
                "params": {
                    k: inner_p[k] for k in ("temporal_dense", "mlp_hidden", "classifier")
                }
            }
        elif self.family == "rnn":
            embed = {
                "params": {
                    "ResNet_0": params["ResNet_0"],
                    "encoder_proj": params["encoder_proj"],
                },
                "batch_stats": {"ResNet_0": stats.get("ResNet_0", {})},
            }
            head = {
                "params": {
                    k: params[k] for k in ("lstm", "decoder_hidden", "decoder_out")
                }
            }
        else:  # resformer
            inner_p = params["model"]
            inner_s = stats.get("model", {})
            embed = {
                "params": {
                    "ResNet_0": inner_p["ResNet_0"],
                    "resnet_ffn": inner_p["resnet_ffn"],
                },
                "batch_stats": {"ResNet_0": inner_s.get("ResNet_0", {})},
            }
            head_keys = [k for k in inner_p if k.startswith("layer_")] + ["classifier"]
            head = {"params": {k: inner_p[k] for k in head_keys}}
        return {"embed": embed, "head": head}
