"""Multi-chip inference: VOD analysis with chunk batches sharded over the
data axis of an 8-device mesh produces identical labels to single-device
execution."""

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from playaid_core_tpu.infer.pipeline import BatchedActionPipeline
from playaid_core_tpu.infer.vod_pipeline import VodAnalyzer
from playaid_core_tpu.parallel.mesh import make_mesh


pytestmark = pytest.mark.slow  # model-compile-heavy; -m 'not slow' skips


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    d = tmp_path_factory.mktemp("sharded")
    path = str(d / "v.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (320, 180))
    rng = np.random.default_rng(0)
    for i in range(32):
        w.write(rng.integers(0, 255, (180, 320, 3), dtype=np.uint8))
    w.release()
    return path


def test_sharded_matches_single_device(video):
    boxes = np.tile(
        np.array([[0.3, 0.5, 0.2, 0.2], [0.7, 0.5, 0.2, 0.2]], np.float32), (32, 1, 1)
    )
    pipe = BatchedActionPipeline(family="cnn", num_actions=6, sequence_length=3,
                                 frame_delta=1, crop_size=32)
    variables = pipe.init(jax.random.PRNGKey(0))

    single = VodAnalyzer(pipe, variables=variables, chunk=8, host_resize=True)
    r_single = single.analyze(video, boxes)

    mesh = make_mesh()  # 8 CPU devices, (data=8, model=1); chunk*2=16 div 8
    sharded = VodAnalyzer(pipe, variables=variables, chunk=8, host_resize=True,
                          mesh=mesh)
    r_sharded = sharded.analyze(video, boxes)

    np.testing.assert_array_equal(r_single["labels"], r_sharded["labels"])
    np.testing.assert_allclose(
        r_single["confidences"], r_sharded["confidences"], rtol=1e-4, atol=1e-4
    )
