"""Driver-contract tests for __graft_entry__."""

import jax
import numpy as np
import pytest


pytestmark = pytest.mark.slow  # model-compile-heavy; -m 'not slow' skips


def test_entry_is_traceable():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    # Trace (no compile) to validate jittability and output shape.
    out_shape = jax.eval_shape(fn, *args)
    assert out_shape.shape == (2, 7, 63)


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dryrun_multichip_odd_device_count():
    import __graft_entry__ as ge

    # Falls back to pure data-parallel when the count isn't even.
    ge.dryrun_multichip(1)


def test_rnn_pipeline_family():
    import jax.numpy as jnp

    from playaid_core_tpu.infer.pipeline import BatchedActionPipeline

    pipe = BatchedActionPipeline(family="rnn", num_actions=6, sequence_length=3,
                                 frame_delta=1, crop_size=32)
    variables = pipe.init(jax.random.PRNGKey(0))
    emb = pipe.embed_crops(variables, jnp.zeros((4, 32, 32, 3)))
    assert emb.shape == (4, 300)
    labels, conf = pipe.classify_sequence(variables, jax.random.normal(
        jax.random.PRNGKey(1), (10, 300)), pad_bucket=16)
    assert labels.shape == (10,)
    assert (np.asarray(conf) <= 100).all()
