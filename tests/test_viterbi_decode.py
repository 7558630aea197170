"""Viterbi decoding of per-window action posteriors.

Boxcar pooling (smooth_radius) blurs move boundaries by up to the
pooling radius; the Viterbi decoder keeps the persistence prior (a label
switch costs switch_cost nats) while placing transitions exactly where
the per-window evidence changes.  These tests pin the decoder's
semantics on hand-built log-prob sequences.
"""

import numpy as np
import jax.numpy as jnp

from playaid_core_tpu.infer.pipeline import BatchedActionPipeline

viterbi = BatchedActionPipeline._viterbi_decode


def _lp(seq, n_classes=3, strength=2.0, noise=None):
    """Log-prob rows favoring seq[i] by `strength` nats."""
    lp = np.full((len(seq), n_classes), -strength, np.float32)
    lp[np.arange(len(seq)), seq] = 0.0
    if noise is not None:
        lp += noise
    return lp


def test_viterbi_suppresses_isolated_flips():
    # 0s with single-frame evidence blips to class 1: a blip's 2-nat gain
    # can't pay the two 4-nat switches around it.
    seq = [0] * 20
    seq[7] = 1
    seq[13] = 1
    labels = np.asarray(viterbi(jnp.asarray(_lp(seq)), 20, 4.0))
    assert (labels == 0).all(), labels


def test_viterbi_keeps_genuine_transition_sharp():
    # A real move change: evidence flips at t=10 and stays.  The decoded
    # transition lands exactly at the evidence change (boxcar pooling
    # with radius 4 would wander by a few frames under noise).
    seq = [0] * 10 + [2] * 10
    rng = np.random.default_rng(0)
    lp = _lp(seq, noise=rng.normal(0, 0.3, (20, 3)).astype(np.float32))
    labels = np.asarray(viterbi(jnp.asarray(lp), 20, 4.0))
    assert (labels[:10] == 0).all(), labels
    assert (labels[10:] == 2).all(), labels


def test_viterbi_switches_when_evidence_sustained():
    # 5 sustained frames of class 1 (2 nats each = 10 nats) beat the two
    # 4-nat switches: the segment must survive.
    seq = [0] * 8 + [1] * 5 + [0] * 7
    labels = np.asarray(viterbi(jnp.asarray(_lp(seq)), 20, 4.0))
    assert (labels[8:13] == 1).all(), labels
    assert (labels[:8] == 0).all() and (labels[13:] == 0).all(), labels


def test_viterbi_true_len_masks_padding():
    seq = [0] * 10
    lp = _lp(seq)
    padded = np.concatenate([lp, _lp([1] * 6)], axis=0)  # garbage rows
    labels = np.asarray(viterbi(jnp.asarray(padded), 10, 4.0))
    assert (labels[:10] == 0).all(), labels


def test_viterbi_infinite_cost_is_global_argmax():
    # With an unpayable switch cost the path is constant: the class with
    # the best total evidence.
    seq = [0] * 6 + [1] * 14
    labels = np.asarray(viterbi(jnp.asarray(_lp(seq)), 20, 1e6))
    assert (labels == 1).all(), labels


def test_classify_sequence_viterbi_path_runs():
    # End-to-end shape/compile check through classify_sequence.
    import jax

    pipe = BatchedActionPipeline(family="cnn", num_actions=5,
                                 sequence_length=3, frame_delta=1,
                                 crop_size=32)
    variables = pipe.init(jax.random.PRNGKey(0))
    split = {"embed": variables["embed"], "head": variables["head"]}
    emb = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (24, pipe.embed_dim)).astype(np.float32))
    labels, conf = pipe.classify_sequence(split, emb, pad_bucket=32,
                                          smooth_radius=2, decode="viterbi",
                                          switch_cost=3.0)
    assert labels.shape == (24,) and conf.shape == (24,)
    assert int(labels.min()) >= 0 and int(labels.max()) < 5
    # Viterbi output is piecewise-constant-ish: far fewer switches than
    # frames even on random embeddings.
    switches = int((np.asarray(labels)[1:] != np.asarray(labels)[:-1]).sum())
    assert switches <= 8, switches
