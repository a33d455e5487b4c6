"""Multi-chip data-parallel scene training (batch of cameras per step).

The reference trains one camera per step on one GPU (HAC/train.py:146).
The TPU-native scaling story: each device renders + differentiates its own
camera against the replicated model, gradients pmean over the 'dp' mesh
axis (ICI), and the per-group Adam update applies identically everywhere.
Densification statistics are psum-reduced so host-side anchor adjustment
sees the global view.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

import optax

from gauspcc_tpu.models.hac import model as hac
from gauspcc_tpu.models.hac import render as hac_render
from gauspcc_tpu.render import raster


def stack_cameras(cams: list[hac_render.CameraArrays]) -> hac_render.CameraArrays:
    return hac_render.CameraArrays(
        viewmatrix=jnp.stack([c.viewmatrix for c in cams]),
        camera_center=jnp.stack([c.camera_center for c in cams]),
        image=jnp.stack([c.image for c in cams]),
    )


def make_dp_scene_step(cfg, rcfg: raster.RasterConfig, optimizer, opt,
                       mesh: Mesh, loss_fn=None):
    """Jitted SPMD step: (params, rest, opt_state, stats, cams, keys, phase)
    -> (params, opt_state, stats, metrics). cams/keys sharded over 'dp'."""
    if loss_fn is None:
        loss_fn = hac_render.training_loss

    def per_device(params, rest, opt_state, stats, cam, key, phase):
        cam = hac_render.CameraArrays(
            viewmatrix=cam.viewmatrix[0],
            camera_center=cam.camera_center[0],
            image=cam.image[0],
        )
        cap_k = params["anchors"]["offset"].shape[0] * cfg.n_offsets
        m2d = jnp.zeros((cap_k, 2), jnp.float32)
        bg = jnp.zeros(3, jnp.float32)
        (loss, aux), (grads, g_m2d) = jax.value_and_grad(
            loss_fn, argnums=(0, 8), has_aux=True
        )(params, rest, cfg, cam, rcfg, bg, phase, key[0], m2d,
          opt.lmbda, opt.lambda_dssim)

        grads = jax.lax.pmean(grads, "dp")
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        k = cfg.n_offsets
        vis = aux["visible_anchor"] & rest["valid"]
        opac = jnp.maximum(aux["neural_opacity"].reshape(-1, k), 0.0)
        update_filter = aux["g_valid"] & (aux["radii"] > 0)
        gnorm = jnp.linalg.norm(g_m2d, axis=-1, keepdims=True)
        stats = {
            "opacity_accum": stats["opacity_accum"] + jax.lax.psum(
                jnp.where(vis[:, None], jnp.sum(opac, 1, keepdims=True), 0.0),
                "dp"),
            "anchor_demon": stats["anchor_demon"] + jax.lax.psum(
                vis[:, None].astype(jnp.float32), "dp"),
            "offset_gradient_accum": stats["offset_gradient_accum"]
            + jax.lax.psum(jnp.where(update_filter[:, None], gnorm, 0.0), "dp"),
            "offset_denom": stats["offset_denom"] + jax.lax.psum(
                update_filter[:, None].astype(jnp.float32), "dp"),
        }
        metrics = {
            "loss": jax.lax.pmean(loss, "dp"),
            "psnr": jax.lax.pmean(aux["psnr"], "dp"),
        }
        return params, opt_state, stats, metrics

    cam_spec = hac_render.CameraArrays(P("dp"), P("dp"), P("dp"))

    def step(params, rest, opt_state, stats, cams, keys, phase: int):
        fn = jax.shard_map(
            lambda p, r, o, s, c, k: per_device(p, r, o, s, c, k, phase),
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), cam_spec, P("dp")),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )
        return jax.jit(fn)(params, rest, opt_state, stats, cams, keys)

    return step
