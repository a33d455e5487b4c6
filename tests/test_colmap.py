"""COLMAP binary-format ingestion against an in-test synthetic scene.

The reference loader (HAC/scene/colmap_loader.py, dataset_readers.py:
142-167) is exercised only by real datasets; here we synthesize a valid
sparse/0/{cameras,images,points3D}.bin + images/ tree, parse it through
gauspcc_tpu.data, and drive the real HAC CLI on it end-to-end (train a
few iters -> encode -> decode -> eval) with no _FakeScene anywhere.
"""

import json
import os
import struct

import numpy as np
import pytest

from gauspcc_tpu.data import colmap
from gauspcc_tpu.data.scene import Scene


def _rotmat2qvec(R):
    """Inverse of colmap.qvec2rotmat (w, x, y, z)."""
    K = np.array([
        [R[0, 0] - R[1, 1] - R[2, 2], 0, 0, 0],
        [R[0, 1] + R[1, 0], R[1, 1] - R[0, 0] - R[2, 2], 0, 0],
        [R[0, 2] + R[2, 0], R[1, 2] + R[2, 1], R[2, 2] - R[0, 0] - R[1, 1], 0],
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1],
         R[0, 0] + R[1, 1] + R[2, 2]],
    ]) / 3.0
    vals, vecs = np.linalg.eigh(K)
    q = vecs[[3, 0, 1, 2], np.argmax(vals)]
    return q * np.sign(q[0]) if q[0] != 0 else q


def _orbit_w2c(angle, radius=3.0, height=0.5):
    pos = np.array([radius * np.cos(angle), height, radius * np.sin(angle)])
    fwd = -pos / np.linalg.norm(pos)
    up0 = np.array([0.0, 1.0, 0.0])
    right = np.cross(up0, fwd)
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    r_w2c = np.stack([right, up, fwd])
    t = -r_w2c @ pos
    return r_w2c, t


def write_colmap_fixture(root, n_images=9, wh=32, n_points=200, seed=0):
    """Write a tiny but format-complete COLMAP binary model + PNGs."""
    rng = np.random.default_rng(seed)
    sparse = os.path.join(root, "sparse", "0")
    img_dir = os.path.join(root, "images")
    os.makedirs(sparse, exist_ok=True)
    os.makedirs(img_dir, exist_ok=True)

    # cameras.bin: one PINHOLE (id 1) + one SIMPLE_PINHOLE (id 2)
    focal = wh * 1.2
    with open(os.path.join(sparse, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 2))
        f.write(struct.pack("<iiQQ", 1, 1, wh, wh))  # PINHOLE
        f.write(struct.pack("<4d", focal, focal, wh / 2, wh / 2))
        f.write(struct.pack("<iiQQ", 2, 0, wh, wh))  # SIMPLE_PINHOLE
        f.write(struct.pack("<3d", focal, wh / 2, wh / 2))

    # images.bin with 2D-point payloads that must be skipped correctly
    names = [f"frame_{i:03d}.png" for i in range(n_images)]
    with open(os.path.join(sparse, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_images))
        for i in range(n_images):
            ang = 2 * np.pi * i / n_images
            r_w2c, t = _orbit_w2c(ang)
            q = _rotmat2qvec(r_w2c)
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<7d", *q, *t))
            f.write(struct.pack("<i", 1 if i % 3 else 2))
            f.write(names[i].encode() + b"\x00")
            n2d = int(rng.integers(0, 5))
            f.write(struct.pack("<Q", n2d))
            for _ in range(n2d):
                f.write(struct.pack("<ddq", rng.random() * wh,
                                    rng.random() * wh, -1))

    # points3D.bin with variable-length tracks
    xyz_gt = (rng.random((n_points, 3)) * 1.2 - 0.6)
    rgb_gt = rng.integers(0, 256, (n_points, 3))
    with open(os.path.join(sparse, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_points))
        for i in range(n_points):
            f.write(struct.pack("<Q", i + 1))
            f.write(struct.pack("<3d", *xyz_gt[i]))
            f.write(struct.pack("<3B", *rgb_gt[i]))
            f.write(struct.pack("<d", rng.random()))
            tlen = int(rng.integers(0, 4))
            f.write(struct.pack("<Q", tlen))
            for _ in range(tlen):
                f.write(struct.pack("<ii", 1, 2))

    from PIL import Image

    yy, xx = np.mgrid[0:wh, 0:wh].astype(np.float32) / wh
    for i, name in enumerate(names):
        arr = np.stack([xx, yy, np.full_like(xx, (i + 1) / n_images)], -1)
        Image.fromarray((arr * 255).astype(np.uint8)).save(
            os.path.join(img_dir, name))
    return xyz_gt, rgb_gt, names


@pytest.mark.smoke
def test_binary_parsers_roundtrip(tmp_path):
    root = str(tmp_path / "scene")
    xyz_gt, rgb_gt, names = write_colmap_fixture(root)
    sparse = os.path.join(root, "sparse", "0")

    cams = colmap.read_cameras_binary(os.path.join(sparse, "cameras.bin"))
    assert set(cams) == {1, 2}
    assert cams[1]["model"] == "PINHOLE" and cams[1]["params"].shape == (4,)
    assert cams[2]["model"] == "SIMPLE_PINHOLE"

    images = colmap.read_images_binary(os.path.join(sparse, "images.bin"))
    assert len(images) == 9
    assert sorted(m["name"] for m in images.values()) == sorted(names)
    # qvec must reproduce the w2c rotation it was built from
    m = images[1]
    r_w2c, t = _orbit_w2c(0.0)
    np.testing.assert_allclose(colmap.qvec2rotmat(m["qvec"]), r_w2c,
                               atol=1e-6)
    np.testing.assert_allclose(m["tvec"], t, atol=1e-6)

    xyz, rgb = colmap.read_points3d_binary(os.path.join(sparse, "points3D.bin"))
    np.testing.assert_allclose(xyz, xyz_gt, atol=1e-12)
    np.testing.assert_array_equal(rgb, rgb_gt)


@pytest.mark.smoke
def test_scene_load_and_split(tmp_path):
    root = str(tmp_path / "scene")
    write_colmap_fixture(root)
    scene = Scene(root, eval_split=True, llffhold=8)
    assert not scene.is_blender
    assert len(scene.train_cameras) == 7  # 9 - ceil(9/8)
    assert len(scene.test_cameras) == 2
    assert scene.points.shape == (200, 3)
    assert scene.cameras_extent > 0
    cam = scene.train_cameras[0]
    assert cam.image is not None and cam.image.shape == (3, 32, 32)
    # PINHOLE fov from focal: 2*atan(wh / (2*focal))
    assert np.isclose(cam.fovx, 2 * np.arctan(32 / (2 * 32 * 1.2)), atol=1e-6)


@pytest.mark.slow
def test_hac_cli_on_colmap_scene(tmp_path):
    """The real CLI end-to-end on the fixture: train -> encode -> decode ->
    eval, no _FakeScene (VERDICT r2 item 8)."""
    from gauspcc_tpu.models.hac import cli as hac_cli

    root = str(tmp_path / "scene")
    write_colmap_fixture(root, n_images=6, wh=32, n_points=150)
    model_dir = str(tmp_path / "out")
    hac_cli.main([
        "train", "-s", root, "-m", model_dir,
        "--voxel_size", "0.05", "--iterations", "30",
        "--log2", "13", "--log2_2D", "11",
    ])
    results = json.load(open(os.path.join(model_dir, "results.json")))
    assert results["psnr"] is not None
    assert results["size_mb"] > 0
    assert os.path.exists(os.path.join(model_dir, "bitstreams"))


def test_convert_resize_pipeline(tmp_path):
    """convert.py driver: pre-reconstructed scene -> images/ + images_{2,4}
    pyramids, loadable by Scene at a downscale (reference on-ramp:
    TC-GS/convert.py)."""
    from gauspcc_tpu.cli import convert

    root = str(tmp_path / "scene")
    write_colmap_fixture(root, n_images=4, wh=64)
    os.rename(os.path.join(root, "images"), os.path.join(root, "input"))
    convert.main(["-s", root, "--skip_matching", "--resize"])
    assert os.path.isdir(os.path.join(root, "images"))
    from PIL import Image

    im = Image.open(os.path.join(root, "images_2", "frame_000.png"))
    assert im.size == (32, 32)
    scene = Scene(root, eval_split=False, images_dir="images_2",
                  resolution_scale=2.0)
    cam = scene.train_cameras[0]
    assert cam.image.shape == (3, 32, 32)
    assert cam.width == 32
