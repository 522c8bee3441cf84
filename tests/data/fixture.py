"""Synthetic LINEMOD-format dataset fixture.

Generates a tiny on-disk dataset matching the adapter layout contract
(SURVEY.md §4: `*-color.png`, `-box.txt`, `-pose.txt`, `-intrisic.txt` per
category dir plus models/<cat>/<cat>.ply) with geometrically consistent
poses, intrinsics, boxes, and a cube CAD model — enough to drive the full
preprocessing + eval pipeline end-to-end without real data.
"""

import os

import numpy as np
from PIL import Image, ImageDraw

IMG_W, IMG_H = 640, 480
K_DEFAULT = np.array(
    [[572.4114, 0.0, 325.2611], [0.0, 573.57043, 242.04899], [0.0, 0.0, 1.0]]
)
CUBE_HALF = 0.05  # 10 cm cube


def look_at_pose(angle: float, elevation: float = 0.4, radius: float = 0.6):
    """World->camera pose of a camera on a ring looking at the origin."""
    eye = np.array(
        [
            radius * np.cos(angle) * np.cos(elevation),
            radius * np.sin(angle) * np.cos(elevation),
            radius * np.sin(elevation),
        ]
    )
    fwd = -eye / np.linalg.norm(eye)
    up = np.array([0.0, 0.0, 1.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], axis=0)  # rows: camera axes in world
    t = -R @ eye
    pose = np.eye(4)
    pose[:3, :3] = R
    pose[:3, 3] = t
    return pose


def cube_vertices(n_per_edge: int = 5) -> np.ndarray:
    lin = np.linspace(-CUBE_HALF, CUBE_HALF, n_per_edge)
    g = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), axis=-1).reshape(-1, 3)
    # Keep only surface points.
    on_surface = (np.abs(np.abs(g) - CUBE_HALF) < 1e-9).any(axis=1)
    return g[on_surface]


def project(K, pose, pts):
    cam = pts @ pose[:3, :3].T + pose[:3, 3]
    uv = cam @ K.T
    return uv[:, :2] / uv[:, 2:3]


def write_frame(dir_path: str, idx: int, pose: np.ndarray, split: str):
    base = os.path.join(dir_path, f"{idx:04d}")
    pts2d = project(K_DEFAULT, pose, cube_vertices())
    box = np.array(
        [pts2d[:, 0].min(), pts2d[:, 1].min(), pts2d[:, 0].max(), pts2d[:, 1].max()]
    )
    img = Image.new("RGB", (IMG_W, IMG_H), (20, 24, 30))
    draw = ImageDraw.Draw(img)
    draw.rectangle([int(v) for v in box], fill=(180, 120, 60))
    img.save(base + "-color.png")
    np.savetxt(base + "-pose.txt", pose)
    np.savetxt(base + "-intrisic.txt", K_DEFAULT)
    if split == "train":
        # Train/ref boxes are stored as [x, y, w, h] (the OnePose++
        # preprocessed layout; reference linemod.py:283-285 converts).
        np.savetxt(
            base + "-box.txt",
            np.array([box[0], box[1], box[2] - box[0], box[3] - box[1]]),
        )
    else:
        np.savetxt(base + "-box_fasterrcnn.txt", box)


def write_cube_ply(path: str):
    pts = cube_vertices(7)
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(pts)}\n"
            "property float x\nproperty float y\nproperty float z\nend_header\n"
        )
        for p in pts:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")


def write_lmo_test_frame(dir_path: str, idx: int, pose: np.ndarray):
    """LMO test-preprocessed frame: NNNNNN-color.png, 3x4 -pose.txt, xywh
    -box.txt (BOP bbox_obj convention), NO intrinsics file (both the
    reference and our adapter write the shared LINEMOD defaults)."""
    base = os.path.join(dir_path, f"{idx:06d}")
    pts2d = project(K_DEFAULT, pose, cube_vertices())
    x0, y0 = pts2d[:, 0].min(), pts2d[:, 1].min()
    w, h = pts2d[:, 0].max() - x0, pts2d[:, 1].max() - y0
    img = Image.new("RGB", (IMG_W, IMG_H), (20, 24, 30))
    ImageDraw.Draw(img).rectangle(
        [int(x0), int(y0), int(x0 + w), int(y0 + h)], fill=(60, 160, 120)
    )
    img.save(base + "-color.png")
    np.savetxt(base + "-pose.txt", pose[:3])
    np.savetxt(base + "-box.txt", np.array([x0, y0, w, h]))


def make_lmo_fixture(root: str, cats=("cat",), n_train: int = 8, n_test: int = 3):
    """LINEMOD-Occlusion layout: LINEMOD real_train refs + a
    test-preprocessed occlusion split (reference linemodo.py:74-93)."""
    for cat in cats:
        train_dir = os.path.join(root, "real_train", cat)
        test_dir = os.path.join(root, "test-preprocessed", cat)
        model_dir = os.path.join(root, "models", cat)
        for d in (train_dir, test_dir, model_dir):
            os.makedirs(d, exist_ok=True)
        for i in range(n_train):
            write_frame(train_dir, i, look_at_pose(2 * np.pi * i / n_train), "train")
        for i in range(n_test):
            write_lmo_test_frame(
                test_dir, i, look_at_pose(2 * np.pi * (i + 0.21) / n_test, 0.5)
            )
        write_cube_ply(os.path.join(model_dir, f"{cat}.ply"))
    return root


def write_ycbv_frame(dir_path: str, idx: int, pose: np.ndarray):
    """YCBV frame: xyxy -box.txt + 4x4 -pose.txt + -intrinsics.txt [sic:
    spelled correctly here, unlike LINEMOD's -intrisic.txt]
    (reference ycbv.py:200-204)."""
    base = os.path.join(dir_path, f"{idx:06d}")
    pts2d = project(K_DEFAULT, pose, cube_vertices())
    box = np.array(
        [pts2d[:, 0].min(), pts2d[:, 1].min(), pts2d[:, 0].max(), pts2d[:, 1].max()]
    )
    img = Image.new("RGB", (IMG_W, IMG_H), (25, 20, 35))
    ImageDraw.Draw(img).rectangle([int(v) for v in box], fill=(90, 140, 200))
    img.save(base + "-color.png")
    np.savetxt(base + "-pose.txt", pose)
    np.savetxt(base + "-intrinsics.txt", K_DEFAULT)
    np.savetxt(base + "-box.txt", box)


def make_ycbv_fixture(
    root: str, objs=("obj_01",), n_train: int = 6, n_test: int = 3, seq="0001"
):
    """YCBV-BoxDreamer layout: train/<obj>/<seq>/, test/<obj>/<seq>/, and
    models/<obj>/points.xyz (reference ycbv.py:168-314 — frame files live
    in per-sequence subdirectories, merged per object at load)."""
    for obj in objs:
        train_dir = os.path.join(root, "train", obj, seq)
        test_dir = os.path.join(root, "test", obj, seq)
        model_dir = os.path.join(root, "models", obj)
        for d in (train_dir, test_dir, model_dir):
            os.makedirs(d, exist_ok=True)
        for i in range(n_train):
            write_ycbv_frame(train_dir, i, look_at_pose(2 * np.pi * i / n_train))
        for i in range(n_test):
            write_ycbv_frame(
                test_dir, i, look_at_pose(2 * np.pi * (i + 0.29) / n_test, 0.5)
            )
        np.savetxt(os.path.join(model_dir, "points.xyz"), cube_vertices(7))
    return root


def make_onepose_fixture(root: str, obj="toycar-1017", seqs=("1", "2"), n=5):
    """OnePose layout (reference onepose.py:276-330):
    test_data/<obj>/<obj-prefix>-<seq>/{color,poses_ba,intrin_ba,reproj_box}
    + <obj>/box3d_corners.txt. reproj_box files are REQUIRED (the reference
    skips sequences whose file counts mismatch)."""
    corners = np.array(
        [
            [sx * CUBE_HALF, sy * CUBE_HALF, sz * CUBE_HALF]
            for sz in (-1, 1)
            for sy in (-1, 1)
            for sx in (-1, 1)
        ]
    )
    obj_dir = os.path.join(root, "test_data", obj)
    os.makedirs(obj_dir, exist_ok=True)
    np.savetxt(os.path.join(obj_dir, "box3d_corners.txt"), corners)
    prefix = obj.split("-")[0]
    for s_i, seq in enumerate(seqs):
        seq_dir = os.path.join(obj_dir, f"{prefix}-{seq}")
        for sub in ("color", "poses_ba", "intrin_ba", "reproj_box"):
            os.makedirs(os.path.join(seq_dir, sub), exist_ok=True)
        for i in range(n):
            pose = look_at_pose(2 * np.pi * (i + 0.3 * s_i) / n, 0.45)
            pts2d = project(K_DEFAULT, pose, cube_vertices())
            box = [pts2d[:, 0].min(), pts2d[:, 1].min(), pts2d[:, 0].max(), pts2d[:, 1].max()]
            img = Image.new("RGB", (IMG_W, IMG_H), (30, 18, 22))
            ImageDraw.Draw(img).rectangle([int(v) for v in box], fill=(200, 120, 90))
            img.save(os.path.join(seq_dir, "color", f"{i}.png"))
            np.savetxt(os.path.join(seq_dir, "poses_ba", f"{i}.txt"), pose)
            np.savetxt(os.path.join(seq_dir, "intrin_ba", f"{i}.txt"), K_DEFAULT)
            np.savetxt(
                os.path.join(seq_dir, "reproj_box", f"{i}.txt"),
                project(K_DEFAULT, pose, corners),
            )
    return root


def make_moped_fixture(root: str, obj="toy", seqs=("00", "01"), n=5):
    """MOPED layout (reference moped.py:170-248): reference/<obj>/<seq>/ and
    test/<obj>/<seq>/ with color/*.jpg + mask/*.png + pose/*.txt +
    intrinsics/*.txt, plus per-sequence models/<prefix>-<obj>-<seq>.ply."""
    for prefix, top in (("reference", "reference"), ("test", "test")):
        for seq in seqs:
            seq_dir = os.path.join(root, top, obj, seq)
            for sub in ("color", "mask", "pose", "intrinsics"):
                os.makedirs(os.path.join(seq_dir, sub), exist_ok=True)
            for i in range(n):
                shift = 0.11 if prefix == "test" else 0.0
                pose = look_at_pose(2 * np.pi * (i + shift) / n, 0.42)
                pts2d = project(K_DEFAULT, pose, cube_vertices())
                box = [int(pts2d[:, 0].min()), int(pts2d[:, 1].min()),
                       int(pts2d[:, 0].max()), int(pts2d[:, 1].max())]
                img = Image.new("RGB", (IMG_W, IMG_H), (16, 26, 20))
                ImageDraw.Draw(img).rectangle(box, fill=(150, 150, 80))
                img.save(os.path.join(seq_dir, "color", f"{i}.jpg"), quality=92)
                mask = Image.new("L", (IMG_W, IMG_H), 0)
                ImageDraw.Draw(mask).rectangle(box, fill=255)
                mask.save(os.path.join(seq_dir, "mask", f"{i}.png"))
                np.savetxt(os.path.join(seq_dir, "pose", f"{i}.txt"), pose)
                np.savetxt(os.path.join(seq_dir, "intrinsics", f"{i}.txt"), K_DEFAULT)
            os.makedirs(os.path.join(root, "models"), exist_ok=True)
            write_cube_ply(os.path.join(root, "models", f"{prefix}-{obj}-{seq}.ply"))
    return root


def make_co3d_fixture(root: str, cat="mug", seq="194_1", n=5):
    """CO3D-v2 layout (reference co3d.py:84-266): co3d_test/<cat>/<seq>/
    {images/frameNNNNNN.jpg + .npz, masks/frameNNNNNN.png} selected by
    selected_seqs_test.json ({cat: {seq: [frame indices]}}), plus raw
    pointcloud.ply under co3d_test_raw. npz cameras store cam2world
    'camera_pose' + 'camera_intrinsics'."""
    import json

    seq_dir = os.path.join(root, "co3d_test", cat, seq)
    raw_dir = os.path.join(root, "co3d_test_raw", cat, seq)
    os.makedirs(os.path.join(seq_dir, "images"), exist_ok=True)
    os.makedirs(os.path.join(seq_dir, "masks"), exist_ok=True)
    os.makedirs(raw_dir, exist_ok=True)
    frames = list(range(n))
    with open(os.path.join(root, "co3d_test", "selected_seqs_test.json"), "w") as f:
        json.dump({cat: {seq: frames}}, f)
    for i in frames:
        w2c = look_at_pose(2 * np.pi * (i + 0.17) / n, 0.48)
        pts2d = project(K_DEFAULT, w2c, cube_vertices())
        box = [int(pts2d[:, 0].min()), int(pts2d[:, 1].min()),
               int(pts2d[:, 0].max()), int(pts2d[:, 1].max())]
        img = Image.new("RGB", (IMG_W, IMG_H), (22, 22, 34))
        ImageDraw.Draw(img).rectangle(box, fill=(120, 90, 190))
        img.save(os.path.join(seq_dir, "images", f"frame{i:06d}.jpg"), quality=92)
        mask = Image.new("L", (IMG_W, IMG_H), 0)
        ImageDraw.Draw(mask).rectangle(box, fill=255)
        mask.save(os.path.join(seq_dir, "masks", f"frame{i:06d}.png"))
        np.savez(
            os.path.join(seq_dir, "images", f"frame{i:06d}.npz"),
            camera_pose=np.linalg.inv(w2c),  # cam2world
            camera_intrinsics=K_DEFAULT,
        )
    write_cube_ply(os.path.join(raw_dir, "pointcloud.ply"))
    return root


def make_objaverse_fixture(root: str, shard="000-000", obj="objA", rt="random", n=5):
    """Reference Objaverse render layout (objaverse.py:300-360):
    objaverse_render/_v0/<shard>/<obj>/<render_type>/renderings/*.png
    (RGBA; alpha gives the 2D box) + one meta json with frames[i].w2c and
    per-frame fx/fy/cx/cy, bbox_3d/<obj>.txt, an ok_glb_files.json model
    manifest (glb paths need not exist — prepare_bbox3d then falls back to
    the bbox txt), and the SUN2012 background index."""
    import json

    rt_dir = os.path.join(root, "objaverse_render", "_v0", shard, obj, rt)
    os.makedirs(os.path.join(rt_dir, "renderings"), exist_ok=True)
    os.makedirs(os.path.join(root, "bbox_3d"), exist_ok=True)
    os.makedirs(os.path.join(root, "Objaverse", "Objaverse_glbs"), exist_ok=True)
    corners = np.array(
        [
            [sx * CUBE_HALF, sy * CUBE_HALF, sz * CUBE_HALF]
            for sz in (-1, 1)
            for sy in (-1, 1)
            for sx in (-1, 1)
        ]
    )
    np.savetxt(os.path.join(root, "bbox_3d", f"{obj}.txt"), corners)
    frames = []
    for i in range(n):
        w2c = look_at_pose(2 * np.pi * (i + 0.23) / n, 0.52)
        pts2d = project(K_DEFAULT, w2c, cube_vertices())
        box = [int(pts2d[:, 0].min()), int(pts2d[:, 1].min()),
               int(pts2d[:, 0].max()), int(pts2d[:, 1].max())]
        img = Image.new("RGBA", (IMG_W, IMG_H), (0, 0, 0, 0))
        ImageDraw.Draw(img).rectangle(box, fill=(140, 200, 110, 255))
        img.save(os.path.join(rt_dir, "renderings", f"{i:03d}.png"))
        frames.append(
            {
                "w2c": w2c.tolist(),
                "fx": float(K_DEFAULT[0, 0]), "fy": float(K_DEFAULT[1, 1]),
                "cx": float(K_DEFAULT[0, 2]), "cy": float(K_DEFAULT[1, 2]),
            }
        )
    with open(os.path.join(rt_dir, "meta.json"), "w") as f:
        json.dump({"frames": frames}, f)
    glb = os.path.join(root, "Objaverse", "Objaverse_glbs", shard, obj + ".glb")
    with open(os.path.join(root, "ok_glb_files.json"), "w") as f:
        json.dump({shard: [glb]}, f)
    # SUN2012 background pool (reference loads the index unconditionally).
    os.makedirs(os.path.join(root, "SUN2012pascalformat", "ImageSets", "Main"),
                exist_ok=True)
    os.makedirs(os.path.join(root, "SUN2012pascalformat", "JPEGImages"),
                exist_ok=True)
    for name in ("train.txt", "test.txt"):
        with open(
            os.path.join(root, "SUN2012pascalformat", "ImageSets", "Main", name), "w"
        ) as f:
            f.write("bg0\n")
    Image.new("RGB", (64, 48), (90, 90, 90)).save(
        os.path.join(root, "SUN2012pascalformat", "JPEGImages", "bg0.jpg")
    )
    return root


def make_linemod_fixture(root: str, cats=("cat",), n_train: int = 8, n_test: int = 3):
    """Create the fixture tree; returns the root path."""
    for cat in cats:
        train_dir = os.path.join(root, "real_train", cat)
        test_dir = os.path.join(root, "real_test", cat)
        model_dir = os.path.join(root, "models", cat)
        os.makedirs(train_dir, exist_ok=True)
        os.makedirs(test_dir, exist_ok=True)
        os.makedirs(model_dir, exist_ok=True)
        for i in range(n_train):
            write_frame(train_dir, i, look_at_pose(2 * np.pi * i / n_train), "train")
        for i in range(n_test):
            write_frame(
                test_dir, i, look_at_pose(2 * np.pi * (i + 0.37) / n_test, 0.55), "test"
            )
        write_cube_ply(os.path.join(model_dir, f"{cat}.ply"))
    return root
