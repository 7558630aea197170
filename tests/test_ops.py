import numpy as np
import pytest

import jax.numpy as jnp

from playaid_core_tpu.geometry import YoloCrop
from playaid_core_tpu.ops.preprocess import (
    batched_crop_resize_shared_frame,
    batched_square_crop_resize,
    middle_out_frame_indices,
)


def _middle_out_reference(middle_frame, num_frames_per_sample, frame_delta, max_frames,
                          min_frame=0):
    """Direct transcription of the reference sampler's behavior
    (reference: dataset_utils.py:109-138) for cross-checking."""
    import math

    middle_index = math.floor(num_frames_per_sample / 2)
    frame_nums = []
    for i in range(num_frames_per_sample):
        offset = abs(frame_delta * ((middle_index - i) ** 2))
        if i < num_frames_per_sample / 2:
            frame_nums.append(max(min_frame, middle_frame - offset))
        elif i == num_frames_per_sample / 2:
            frame_nums.append(middle_frame)
        else:
            frame_nums.append(min(max_frames - 1, middle_frame + offset))
    return frame_nums


@pytest.mark.parametrize("middle", [1, 5, 50, 299])
@pytest.mark.parametrize("delta", [1, 3])
def test_middle_out_matches_reference(middle, delta):
    ours = np.asarray(middle_out_frame_indices(middle, 7, delta, 300, min_frame=1))
    ref = _middle_out_reference(middle, 7, delta, 300, min_frame=1)
    assert ours.tolist() == ref


def test_middle_out_batched():
    mids = jnp.array([1, 10, 295])
    out = np.asarray(middle_out_frame_indices(mids, 7, 3, 300, min_frame=1))
    assert out.shape == (3, 7)
    for row, mid in zip(out, [1, 10, 295]):
        assert row.tolist() == _middle_out_reference(int(mid), 7, 3, 300, min_frame=1)


def _random_frame(rng, h=180, w=320):
    return rng.integers(0, 255, (h, w, 3), dtype=np.uint8)


def test_batched_crop_matches_host_path():
    """Device crop agrees with the host YoloCrop.square_crop + resize path
    to within interpolation tolerance."""
    rng = np.random.default_rng(0)
    frame = _random_frame(rng)
    # Use a smooth gradient so bilinear-vs-area interpolation differences
    # stay small.
    yy, xx = np.mgrid[0:180, 0:320]
    frame = np.stack([yy % 256, xx % 256, (yy + xx) % 256], axis=-1).astype(np.uint8)

    crop = YoloCrop(0.5, 0.5, 0.3, 0.25)
    ok, host = crop.square_crop(frame, output_size=128, padding=10)
    assert ok

    boxes = jnp.array([[0.5, 0.5, 0.3, 0.25]])
    device = np.asarray(
        batched_square_crop_resize(jnp.asarray(frame)[None], boxes, out_size=128, padding=10)
    )[0]
    host_f = host.astype(np.float32) / 255.0
    err = np.abs(device - host_f)
    assert err.mean() < 0.02, err.mean()


def test_crop_letterbox_black_outside():
    frame = np.full((180, 320, 3), 255, np.uint8)
    # Box centered at the left edge: half the window is off-frame.
    boxes = jnp.array([[0.0, 0.5, 0.3, 0.3]])
    out = np.asarray(
        batched_square_crop_resize(jnp.asarray(frame)[None], boxes, out_size=64)
    )[0]
    # Left portion black (off-frame), right portion white.
    assert out[:, :16].mean() < 0.1
    assert out[32, 48].mean() > 0.9


def test_shared_frame_variant():
    frame = np.random.default_rng(1).integers(0, 255, (180, 320, 3), dtype=np.uint8)
    boxes = jnp.array([[0.3, 0.5, 0.2, 0.2], [0.7, 0.5, 0.2, 0.2]])
    out = np.asarray(batched_crop_resize_shared_frame(jnp.asarray(frame), boxes, out_size=64))
    assert out.shape == (2, 64, 64, 3)
    # The two crops see different content.
    assert not np.allclose(out[0], out[1])


def test_bgr_flip():
    frame = np.zeros((64, 64, 3), np.uint8)
    frame[..., 0] = 200  # channel 0 bright
    boxes = jnp.array([[0.5, 0.5, 0.5, 0.5]])
    out = np.asarray(
        batched_square_crop_resize(jnp.asarray(frame)[None], boxes, out_size=32,
                                   bgr_to_rgb=True)
    )[0]
    assert out[16, 16, 2] > 0.7 and out[16, 16, 0] < 0.05


def test_pallas_kernel_bottom_edge_coverage():
    """Crops touching the bottom/right frame edge must match the pure-JAX
    path (the aligned-DMA clamp used to leave the last rows unreachable
    and black)."""
    from playaid_core_tpu.ops.pallas_kernels import pallas_square_crop_resize

    yy, xx = np.mgrid[0:100, 0:320]
    frame = np.stack([yy % 251, xx % 251, (yy + xx) % 251], axis=-1).astype(np.uint8)
    # Box hugging the bottom edge: rows ~69-99.
    boxes = jnp.array([[0.5, 0.85, 0.09, 0.3], [0.97, 0.5, 0.12, 0.2]])
    ref = np.asarray(
        batched_square_crop_resize(jnp.asarray(frame)[None].repeat(2, 0), boxes,
                                   out_size=48, padding=0)
    )
    out = np.asarray(
        pallas_square_crop_resize(
            jnp.asarray(frame)[None].repeat(2, 0), boxes, out_size=48, padding=0,
            win_h=96, win_w=256, interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_pallas_kernel_interpret_matches_jax():
    from playaid_core_tpu.ops.pallas_kernels import pallas_square_crop_resize

    rng = np.random.default_rng(2)
    frames = rng.integers(0, 255, (2, 180, 320, 3), dtype=np.uint8)
    boxes = jnp.array([[0.5, 0.5, 0.3, 0.25], [0.25, 0.4, 0.2, 0.3]])

    ref = np.asarray(
        batched_square_crop_resize(jnp.asarray(frames), boxes, out_size=64, padding=4)
    )
    out = np.asarray(
        pallas_square_crop_resize(
            jnp.asarray(frames), boxes, out_size=64, padding=4,
            win_h=160, win_w=320, interpret=True,
        )
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-4)
