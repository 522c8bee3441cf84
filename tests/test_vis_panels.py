"""Visualization-panel tests (vis_utils.py:593-1032 / plot_utils.py parity
surface)."""

import numpy as np

from boxdreamer_tpu.utils import vis_panels as vp


def test_direction_and_moment_colors():
    H = W = 16
    rays = np.zeros((H, W, 6))
    rays[..., 3:] = [0, 0, 1]  # +z direction
    col = vp.direction_as_color(rays)
    assert col.shape == (H, W, 3) and col.dtype == np.uint8
    np.testing.assert_array_equal(col[0, 0], [127, 127, 255])
    rays[..., :3] = [1, 0, 0]
    mom = vp.moment_as_color(rays)
    np.testing.assert_array_equal(mom[0, 0], [255, 127, 127])


def test_grid_and_labels():
    imgs = [np.full((8, 8, 3), i * 30, np.uint8) for i in range(5)]
    grid = vp.arrange_images_grid(imgs)
    assert grid.shape == (24, 24, 3)  # 3x3 grid of 8x8
    assert (grid[0:8, 0:8] == 0).all() and (grid[0:8, 8:16] == 30).all()
    labeled = vp.add_label(imgs[0], "hello")
    assert labeled.shape[0] > 8 and labeled.shape[1] == 8
    txt = vp.add_text_to_image(imgs[0], "x")
    assert txt.shape == (8, 8, 3)


def test_blend_and_error_colormap():
    img = np.zeros((8, 8, 3), np.uint8)
    hm = np.linspace(0, 1, 64).reshape(8, 8)
    out = vp.blend_img_heatmap(img, hm, alpha=0.5)
    assert out.shape == (8, 8, 3) and out.max() > 0
    cm = vp.error_colormap(np.array([0.0, 0.5, 1.0]))
    np.testing.assert_allclose(cm[0], [1, 0, 0, 1])  # low conf -> red
    np.testing.assert_allclose(cm[2], [0, 1, 0, 1])  # high conf -> green


def test_voting_map_vis():
    vot = np.zeros((16, 12, 12), np.float32)
    out = vp.draw_bbox_vector_map(vot)
    assert out.shape == (12, 12, 3)
    rgb = np.ones((3, 12, 12), np.float32)
    out2 = vp.draw_bbox_vector_map(vot, rgb)
    assert out2.shape == (12, 12, 3)


def test_heatmap_grid():
    hms = np.random.default_rng(0).uniform(-1, 1, (8, 16, 16))
    grid = vp.heatmap_grid(hms, rgb=np.zeros((3, 16, 16), np.float32))
    assert grid.ndim == 3 and grid.shape[2] == 3
    assert grid.shape[0] >= 3 * 16  # 3x3 grid incl. label banners


def test_ray_panel():
    rays = np.random.default_rng(1).normal(size=(16, 16, 6))
    panel = vp.visualize_and_label_rays(rays, rays)
    assert panel.shape[1] == 32  # two 16-wide columns


def test_frames_from_batch():
    rng = np.random.default_rng(2)
    batch = {
        "images": rng.uniform(0, 1, (2, 4, 3, 32, 32)).astype(np.float32),
        "query_idx": np.array([3, 0]),
    }
    frames = vp.frames_from_batch(batch, metrics={"ADD": [0.01, 0.02]})
    assert len(frames) == 2
    for f in frames:
        assert f.ndim == 3 and f.shape[2] == 3
        assert f.shape[1] > 64  # ref grid + query column side by side
