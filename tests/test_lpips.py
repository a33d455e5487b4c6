"""LPIPS plumbing: the VGG+linear-head pipeline runs end-to-end with
random-but-fixed weights (real weights need an export on a connected
machine — utils/lpips.py docstring). Parity target:
HAC/lpipsPyTorch/modules/lpips.py."""

import numpy as np
import pytest

from gauspcc_tpu.utils import lpips as lpips_lib


@pytest.fixture(scope="module")
def fn_and_imgs(tmp_path_factory):
    w = lpips_lib.random_weights(0)
    path = tmp_path_factory.mktemp("lpips") / "w.npz"
    np.savez(path, **w)
    fn = lpips_lib.load_default_lpips(str(path))
    rng = np.random.default_rng(1)
    a = rng.random((3, 32, 32)).astype(np.float32)
    b = rng.random((3, 32, 32)).astype(np.float32)
    return fn, a, b


def test_zero_on_equal(fn_and_imgs):
    fn, a, _ = fn_and_imgs
    assert float(fn(a, a)) == pytest.approx(0.0, abs=1e-6)


def test_symmetric_and_positive(fn_and_imgs):
    fn, a, b = fn_and_imgs
    d_ab = float(fn(a, b))
    d_ba = float(fn(b, a))
    assert d_ab > 0
    assert d_ab == pytest.approx(d_ba, rel=1e-5)


def test_env_var_resolution(fn_and_imgs, tmp_path, monkeypatch):
    w = lpips_lib.random_weights(0)
    path = tmp_path / "w.npz"
    np.savez(path, **w)
    monkeypatch.setenv("GAUSPCC_LPIPS_WEIGHTS", str(path))
    fn = lpips_lib.load_default_lpips()
    _, a, b = fn_and_imgs
    assert float(fn(a, b)) > 0


@pytest.mark.slow
def test_evaluate_reports_lpips_with_weights(tmp_path, monkeypatch):
    """results.json gets a non-null lpips once a weights file is present
    (the reference always reports LPIPS — HAC/train.py:528-563)."""
    import jax

    from gauspcc_tpu.models.hac import model as hac
    from gauspcc_tpu.models.hac import pipeline
    from tests.test_hac_train import SMALL_CFG, _gt_scene, _orbit_camera, _render_gt

    w = lpips_lib.random_weights(0)
    path = tmp_path / "w.npz"
    np.savez(path, **w)
    monkeypatch.setenv("GAUSPCC_LPIPS_WEIGHTS", str(path))

    rng = np.random.default_rng(0)
    scene_g = _gt_scene(rng)
    cam = _orbit_camera(0, 0.3)
    cam.image = _render_gt(cam, scene_g)
    pts = (rng.random((200, 3)) * 1.2 - 0.6).astype(np.float32)
    state = hac.init_state(
        jax.random.PRNGKey(0), SMALL_CFG,
        hac.voxelize_points(pts, SMALL_CFG.voxel_size))
    state = hac.update_anchor_bound(state)
    results = pipeline.evaluate(state, SMALL_CFG, [cam], str(tmp_path / "r"))
    assert results["lpips"] is not None and np.isfinite(results["lpips"])
