"""Multi-camera data-parallel HAC training on the 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from gauspcc_tpu.models.hac import model as hac
from gauspcc_tpu.models.hac import render as hac_render
from gauspcc_tpu.models.hac import train as hac_train
from gauspcc_tpu.parallel import dp_scene
from gauspcc_tpu.render import raster

from tests.test_hac_train import SMALL_CFG, _gt_scene, _orbit_camera, _render_gt, H, W


@pytest.mark.slow
def test_dp_scene_step_runs_and_improves():
    n_dev = 8
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("dp",))
    rng = np.random.default_rng(3)
    scene = _gt_scene(rng)
    cams = []
    for i, ang in enumerate(np.linspace(0, 2 * np.pi, n_dev, endpoint=False)):
        c = _orbit_camera(i, ang)
        c.image = _render_gt(c, scene)
        cams.append(hac_render.CameraArrays.from_camera(c))
    batch = dp_scene.stack_cameras(cams)

    pts = hac.voxelize_points(
        (rng.random((300, 3)) * 1.2 - 0.6).astype(np.float32),
        SMALL_CFG.voxel_size)
    state = hac.update_anchor_bound(
        hac.init_state(jax.random.PRNGKey(0), SMALL_CFG, pts))
    opt = hac_train.OptConfig(iterations=100, lmbda=1e-3)
    optimizer = hac_train.make_optimizer(opt, spatial_lr_scale=4.0)
    params, rest = hac.split_state(state)
    opt_state = optimizer.init(params)
    stats = hac_train.zero_stats(rest["valid"].shape[0], SMALL_CFG.n_offsets)
    rcfg = raster.RasterConfig(H, W, 0.483, 0.483,
                               max_gaussians_per_tile=64)
    step = dp_scene.make_dp_scene_step(SMALL_CFG, rcfg, optimizer, opt, mesh)

    losses = []
    key = jax.random.PRNGKey(1)
    for it in range(8):
        key, *subs = jax.random.split(key, n_dev + 1)
        keys = jnp.stack(subs)
        params, opt_state, stats, metrics = step(
            params, rest, opt_state, stats, batch, keys, 0)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # stats accumulated globally (psum over 8 devices)
    assert float(jnp.max(stats["anchor_demon"])) >= 8.0
