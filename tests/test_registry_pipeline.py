"""Family registry + generic pipeline smoke tests (tcgs + cat3dgs drive
the same pipeline HAC does)."""

import json
import os

import numpy as np
import jax
import pytest

from gauspcc_tpu.codecs.gauspcgc import model as pcc_model
from gauspcc_tpu.models import registry
from gauspcc_tpu.models.hac import pipeline
from gauspcc_tpu.models.hac import train as hac_train

from tests.test_hac_pipeline import _FakeScene
from tests.test_hac_train import _gt_scene, _orbit_camera, _render_gt


def test_registry_families_resolve():
    for name in registry.FAMILIES:
        fam = registry.get_family(name)
        assert fam.name == name
        assert callable(fam.training_loss)
    with pytest.raises(ValueError):
        registry.get_family("nope")


@pytest.mark.slow
@pytest.mark.parametrize("name,cfg_kw", [
    ("hac_plus", dict(feat_dim=10, n_offsets=3, voxel_size=0.05,
                      resolutions_3d=(6, 10, 16), resolutions_2d=(16, 32),
                      log2_hashmap_size=13, log2_hashmap_size_2d=13)),
    ("tcgs", dict(feat_dim=8, n_offsets=3, voxel_size=0.05, tri_feat=4,
                  tri_res=16, tri_samples=2, ae_compressed=4)),
    ("cat3dgs", dict(feat_dim=8, n_offsets=3, voxel_size=0.05,
                     chcm_slices=(4, 4), tri_feat=1, base_resolution=16,
                     multiscale=(1, 2))),
])
def test_generic_pipeline_family(tmp_path, name, cfg_kw):
    rng = np.random.default_rng(2)
    scene_g = _gt_scene(rng)
    cams = []
    for i, ang in enumerate(np.linspace(0, 2 * np.pi, 5, endpoint=False)):
        c = _orbit_camera(i, ang)
        c.image = _render_gt(c, scene_g)
        cams.append(c)
    pts = (rng.random((300, 3)) * 1.2 - 0.6).astype(np.float32)
    scene = _FakeScene(cams, pts, extent=4.0)

    fam = registry.get_family(name)
    cfg = fam.make_config(**cfg_kw)
    pcc_cfg = pcc_model.NetConfig(channels=8, kernel_size=3)
    pcc_params = pcc_model.init_params(jax.random.PRNGKey(3), pcc_cfg)
    opt = hac_train.OptConfig(iterations=12, update_from=100, lmbda=1e-3)

    model_dir = str(tmp_path / name)
    state, results = pipeline.train_scene(
        scene, cfg, opt, model_dir, pcc_params, pcc_cfg,
        log_every=100, family=fam,
    )
    saved = json.load(open(os.path.join(model_dir, "results.json")))
    assert saved["psnr"] is not None and np.isfinite(saved["psnr"])
    assert os.path.exists(os.path.join(model_dir, "bitstreams", "xyz_pcc.bin"))
