import numpy as np

from playaid_core_tpu.geometry import (
    YoloCrop,
    calculate_focal_length,
    calculate_intrinsic_matrix,
    calculate_lookat_matrix,
    invert_pose_batch,
    lookat_matrices_batch,
    project_point_to_pixel,
    project_points_batch,
)


def test_focal_length():
    # 90 degree FOV: f = w / (2 tan(45)) = w / 2.
    assert np.isclose(calculate_focal_length(90, 1280), 640.0)


def test_intrinsics_shape_and_center():
    K = calculate_intrinsic_matrix(30, 1280, 720)
    assert K.shape == (3, 3)
    assert K[0, 2] == 640 and K[1, 2] == 360 and K[2, 2] == 1


def test_projection_center_of_view():
    # Camera looking straight down -z at the origin: a point at the target
    # projects to the image center (x), with the y flip applied.
    cam = [0.0, 10.0, 100.0]
    tgt = [0.0, 10.0, 0.0]
    pose = calculate_lookat_matrix(cam, tgt)
    K = calculate_intrinsic_matrix(30, 1280, 720)
    px = project_point_to_pixel([0.0, 10.0, 0.0], K, pose)
    assert px[0] == 640
    assert px[1] == 720 - 360


def test_batch_projection_matches_scalar():
    rng = np.random.default_rng(0)
    n = 64
    cams = rng.uniform([-5, 5, 80], [5, 25, 200], size=(n, 3))
    tgts = rng.uniform([-5, 5, -1], [5, 25, 1], size=(n, 3))
    pts = rng.uniform([-60, -10, 0], [60, 60, 0], size=(n, 3))
    K = calculate_intrinsic_matrix(50, 1280, 720)

    poses = lookat_matrices_batch(cams, tgts)
    inv = invert_pose_batch(poses)
    batch = project_points_batch(pts, K, inv)

    for i in range(n):
        pose = calculate_lookat_matrix(cams[i], tgts[i])
        scalar = project_point_to_pixel(pts[i], K, pose)
        assert np.array_equal(batch[i], scalar), (i, batch[i], scalar)


def test_pose_inverse_matches_linalg():
    poses = lookat_matrices_batch(
        np.array([[1.0, 2.0, 100.0]]), np.array([[0.0, 2.0, 0.0]])
    )
    inv = invert_pose_batch(poses)
    np.testing.assert_allclose(inv[0], np.linalg.inv(poses[0]), atol=1e-10)


def test_yolocrop_roundtrips():
    c = YoloCrop(0.5, 0.4, 0.2, 0.3, confidence=0.9, class_id=2)
    c2 = YoloCrop.from_string(str(c))
    assert np.isclose(c2.center_x, 0.5) and c2.class_id == 2
    x1, y1, x2, y2 = c.xyxy_pixels(1280, 720)
    assert (x1, y1) == (int(0.4 * 1280), int(0.25 * 720))
    assert (x2, y2) == (int(0.6 * 1280), int(0.55 * 720))


def test_yolocrop_interp():
    a = YoloCrop(0.0, 0.0, 0.1, 0.1, class_id=1)
    b = YoloCrop(1.0, 1.0, 0.3, 0.3, class_id=1)
    mid = a.interp(b, 0.5)
    assert np.isclose(mid.center_x, 0.5) and np.isclose(mid.crop_width, 0.2)


def test_square_crop_letterbox():
    img = np.full((720, 1280, 3), 200, np.uint8)
    crop = YoloCrop(0.5, 0.5, 0.1, 0.2)
    ok, out = crop.square_crop(img, output_size=128, padding=10)
    assert ok and out.shape == (128, 128, 3)

    # Near-border crop still letterboxes to shape.
    edge = YoloCrop(0.01, 0.01, 0.1, 0.2)
    ok, out = edge.square_crop(img, output_size=128)
    assert ok and out.shape == (128, 128, 3)


def test_square_crop_fractional_padding_scale_invariant_fill():
    """Float padding in (0,1) pads by a FRACTION of the box's square dim,
    so the subject's fill ratio of the output window is the same at every
    subject scale (fixed pixel pads shrink small subjects much more)."""
    def fill_ratio(box_px):
        img = np.zeros((720, 1280, 3), np.uint8)
        x0, y0 = 400, 300
        img[y0:y0 + box_px, x0:x0 + box_px] = 255
        crop = YoloCrop((x0 + box_px / 2) / 1280, (y0 + box_px / 2) / 720,
                        box_px / 1280, box_px / 720)
        ok, out = crop.square_crop(img, output_size=128, padding=0.125)
        assert ok
        cols = (out[:, :, 0].max(axis=0) > 127).sum()
        return cols / 128.0

    small, large = fill_ratio(40), fill_ratio(160)
    assert abs(small - large) < 0.06, (small, large)
    assert 0.7 < small < 0.9, small

    # int padding keeps the reference's pixel semantics: small boxes end
    # up with much lower fill than large ones.
    def fill_ratio_px(box_px):
        img = np.zeros((720, 1280, 3), np.uint8)
        img[300:300 + box_px, 400:400 + box_px] = 255
        crop = YoloCrop((400 + box_px / 2) / 1280, (300 + box_px / 2) / 720,
                        box_px / 1280, box_px / 720)
        ok, out = crop.square_crop(img, output_size=128, padding=16)
        assert ok
        return (out[:, :, 0].max(axis=0) > 127).sum() / 128.0

    assert fill_ratio_px(40) < fill_ratio_px(160) - 0.15


def test_from_pixel_coordinates():
    c = YoloCrop.from_pixel_coordinates(1280, 720, 100, 50, 300, 50, 100, 250, 300, 250)
    assert np.isclose(c.center_x, 200 / 1280)
    assert np.isclose(c.crop_width, 200 / 1280)
    assert np.isclose(c.crop_height, 200 / 720)
