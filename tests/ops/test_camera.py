import jax
import jax.numpy as jnp
import numpy as np

from boxdreamer_tpu.ops import camera, rotation


def make_scene(key, batch=4):
    """Random camera looking at points in front of it."""
    k1, k2, k3 = jax.random.split(key, 3)
    rvec = jax.random.normal(k1, (batch, 3)) * 0.3
    R = rotation.rodrigues(rvec)
    t = jnp.concatenate(
        [jax.random.normal(k2, (batch, 2)) * 0.1, jnp.ones((batch, 1)) * 3.0], axis=-1
    )
    pose = jnp.tile(jnp.eye(4), (batch, 1, 1))
    pose = pose.at[:, :3, :3].set(R).at[:, :3, 3].set(t)
    K = jnp.tile(
        jnp.array([[300.0, 0, 112.0], [0, 300.0, 112.0], [0, 0, 1.0]]), (batch, 1, 1)
    )
    pts = jax.random.normal(k3, (batch, 8, 3)) * 0.5
    return pose, K, pts


def test_project_points_pinhole():
    # A point on the optical axis projects to the principal point.
    K = jnp.array([[100.0, 0, 50.0], [0, 100.0, 60.0], [0, 0, 1.0]])
    pose = jnp.eye(4)
    pts = jnp.array([[0.0, 0.0, 2.0]])
    uv = camera.project_points(pts, K, pose)
    np.testing.assert_allclose(uv, [[50.0, 60.0]], atol=1e-5)


def test_project_unit_offset():
    K = jnp.array([[100.0, 0, 50.0], [0, 100.0, 60.0], [0, 0, 1.0]])
    pose = jnp.eye(4)
    pts = jnp.array([[1.0, -1.0, 2.0]])
    uv = camera.project_points(pts, K, pose)
    np.testing.assert_allclose(uv, [[100.0, 10.0]], atol=1e-4)


def test_invert_pose():
    pose, _, _ = make_scene(jax.random.PRNGKey(0))
    inv = camera.invert_pose(pose)
    prod = camera.compose_poses(pose, inv)
    np.testing.assert_allclose(prod, np.tile(np.eye(4), (4, 1, 1)), atol=1e-5)


def test_transform_points_roundtrip():
    pose, _, pts = make_scene(jax.random.PRNGKey(1))
    fwd = camera.transform_points(pose, pts)
    back = camera.transform_points(camera.invert_pose(pose), fwd)
    np.testing.assert_allclose(back, pts, atol=1e-5)


def test_ndc_pixel_roundtrip():
    fl = jnp.array([[2.1, 1.9]])
    pp = jnp.array([[0.05, -0.1]])
    size = jnp.array([[640.0, 480.0]])
    fl_px, pp_px = camera.ndc_to_pixels(fl, pp, size)
    fl2, pp2 = camera.pixels_to_ndc(fl_px, pp_px, size)
    np.testing.assert_allclose(fl2, fl, atol=1e-6)
    np.testing.assert_allclose(pp2, pp, atol=1e-6)


def test_ndc_convention_matches_reference():
    # Centered principal point -> ndc pp == 0; f_ndc = f_px / (size/2).
    size = jnp.array([640.0, 480.0])
    fl, pp = camera.pixels_to_ndc(
        jnp.array([320.0, 240.0]), jnp.array([320.0, 240.0]), size
    )
    np.testing.assert_allclose(pp, [0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(fl, [1.0, 1.0], atol=1e-6)


def test_square_bbox():
    bbox = jnp.array([10.0, 20.0, 30.0, 80.0])
    sq = camera.square_bbox(bbox)
    # center (20, 50), max half-extent 30.
    np.testing.assert_allclose(sq, [-10.0, 20.0, 50.0, 80.0], atol=1e-5)
    w = sq[2] - sq[0]
    h = sq[3] - sq[1]
    np.testing.assert_allclose(w, h, atol=1e-5)


def test_square_bbox_padding():
    bbox = jnp.array([0.0, 0.0, 10.0, 10.0])
    sq = camera.square_bbox(bbox, padding=0.1)
    np.testing.assert_allclose(sq, [-0.5, -0.5, 10.5, 10.5], atol=1e-5)


def test_bbox_from_projection():
    proj = jnp.array([[[0.0, 1.0], [5.0, -2.0], [3.0, 9.0]] + [[1.0, 1.0]] * 5])
    out = camera.bbox_from_projection(proj)
    np.testing.assert_allclose(out[0], [0.0, -2.0, 5.0, 9.0], atol=1e-6)


def test_crop_resize_intrinsics_consistency():
    """Cropping + resizing the intrinsics keeps projections consistent:
    project with original K, map pixels through the crop transform, and
    compare with projecting using the adjusted K."""
    pose, K, pts = make_scene(jax.random.PRNGKey(2))
    crop = jnp.tile(jnp.array([40.0, 30.0, 200.0, 190.0]), (4, 1))
    out_size = jnp.tile(jnp.array([224.0, 224.0]), (4, 1))
    K_adj = camera.adjust_intrinsics_for_crop_resize(K, crop, out_size)

    uv = camera.project_points(pts, K, pose)
    scale = out_size / (crop[:, 2:] - crop[:, :2])
    uv_mapped = (uv - crop[:, None, :2]) * scale[:, None, :]
    uv_direct = camera.project_points(pts, K_adj, pose)
    np.testing.assert_allclose(uv_mapped, uv_direct, atol=1e-3)


def test_crop_ndc_pipeline_matches_pixel_pipeline():
    """The reference's NDC crop+rescale chain (adjust_camera_to_bbox_crop_ then
    adjust_camera_to_image_scale_) must agree with the direct pixel-space
    adjustment."""
    K = jnp.array([[500.0, 0, 320.0], [0, 510.0, 245.0], [0, 0, 1.0]])
    img_wh = jnp.array([640.0, 480.0])
    crop_xyxy = jnp.array([100.0, 80.0, 300.0, 280.0])
    out_wh = jnp.array([224.0, 224.0])

    # NDC route (reference base.py:566-626).
    fl_ndc, pp_ndc = camera.pixels_to_ndc(
        jnp.array([K[0, 0], K[1, 1]]), K[:2, 2], img_wh
    )
    bbox_xywh = jnp.concatenate(
        [crop_xyxy[:2], crop_xyxy[2:] - crop_xyxy[:2]], axis=-1
    )
    fl_c, pp_c = camera.adjust_camera_to_bbox_crop(fl_ndc, pp_ndc, img_wh, bbox_xywh)
    fl_s, pp_s = camera.adjust_camera_to_image_scale(fl_c, pp_c, bbox_xywh[2:], out_wh)
    fl_px, pp_px = camera.ndc_to_pixels(fl_s, pp_s, out_wh)

    # Direct pixel route.
    K_adj = camera.adjust_intrinsics_for_crop_resize(K, crop_xyxy, out_wh)
    np.testing.assert_allclose(fl_px, [K_adj[0, 0], K_adj[1, 1]], atol=1e-3)
    np.testing.assert_allclose(pp_px, K_adj[:2, 2], atol=1e-3)


def test_calculate_crop_parameters_center_crop():
    # Full-image center square crop of a square image: center offset 0,
    # crop_width 2, scale 1 (reference preprocess.py:55-83 semantics).
    size = jnp.array([224.0, 224.0])
    bbox = jnp.array([0.0, 0.0, 224.0, 224.0])
    params = camera.calculate_crop_parameters(size, bbox)
    np.testing.assert_allclose(params, [0.0, 0.0, 2.0, 1.0], atol=1e-6)


def test_adjust_intrinsics_for_padding():
    K = jnp.array([[100.0, 0, 50.0], [0, 100.0, 60.0], [0, 0, 1.0]])
    K2 = camera.adjust_intrinsics_for_padding(K, 5.0, 7.0)
    np.testing.assert_allclose(K2[0, 2], 55.0)
    np.testing.assert_allclose(K2[1, 2], 67.0)
    np.testing.assert_allclose(K2[0, 0], 100.0)
