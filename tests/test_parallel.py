"""Multi-chip (virtual 8-device CPU mesh) data-parallel training tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import optax

from gauspcc_tpu.codecs.gauspcgc import model
from gauspcc_tpu.parallel import dp


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("dp",))


def _patch(rng, n=400, extent=32):
    pts = rng.integers(0, extent, size=(n * 2, 3))
    return np.unique(pts, axis=0)[:n].astype(np.int64)


@pytest.mark.slow
def test_dp_train_step_runs_and_improves():
    n_dev = 8
    assert len(jax.devices()) >= n_dev
    mesh = _mesh(n_dev)
    net_cfg = model.NetConfig(channels=8, kernel_size=3)
    params = model.init_params(jax.random.PRNGKey(0), net_cfg)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    step = dp.make_dp_train_step(optimizer, net_cfg, mesh)

    rng = np.random.default_rng(0)
    caps = dp.default_capacity_schedule(finest_cap=512, n_levels=3)
    first, last = None, None
    for it in range(6):
        batch = dp.stack_patches(
            [dp.pack_patch(_patch(rng), caps) for _ in range(n_dev)]
        )
        params, opt_state, bpp = step(params, opt_state, batch)
        bpp = float(bpp)
        if first is None:
            first = bpp
        last = bpp
    assert np.isfinite(last)
    assert last < first  # moving downhill on random-but-stationary statistics


@pytest.mark.slow
def test_dp_matches_single_device_gradients():
    """With identical patches on every device, the DP update must equal the
    single-device update (pmean of equal grads is a no-op)."""
    n_dev = 4
    mesh = _mesh(n_dev)
    net_cfg = model.NetConfig(channels=8, kernel_size=3)
    params = model.init_params(jax.random.PRNGKey(1), net_cfg)
    optimizer = optax.sgd(1e-2)
    opt_state = optimizer.init(params)
    step = dp.make_dp_train_step(optimizer, net_cfg, mesh)

    rng = np.random.default_rng(1)
    caps = dp.default_capacity_schedule(finest_cap=512, n_levels=3)
    patch = dp.pack_patch(_patch(rng), caps)
    batch = dp.stack_patches([patch] * n_dev)
    params_dp, _, _ = step(params, opt_state, batch)

    # single-device reference: same loss, plain grad + sgd
    def loss_fn(p):
        total = 0.0
        for i in range(len(patch["pc"])):
            bits, _ = model.level_bits(
                p, net_cfg,
                jnp.asarray(patch["pc"][i]), jnp.asarray(patch["po"][i]),
                jnp.asarray(patch["pm"][i]), jnp.asarray(patch["gt"][i]),
            )
            total = total + bits
        return total / jnp.float32(patch["n_points"])

    grads = jax.grad(loss_fn)(params)
    updates, _ = optimizer.update(grads, opt_state, params)
    params_ref = optax.apply_updates(params, updates)

    for a, b in zip(jax.tree_util.tree_leaves(params_dp),
                    jax.tree_util.tree_leaves(params_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)


def test_pack_patch_capacity_guard():
    rng = np.random.default_rng(2)
    pts = _patch(rng, n=3000, extent=64)
    try:
        dp.pack_patch(pts, caps=[8, 8, 8])
        raise AssertionError("expected capacity error")
    except ValueError as e:
        assert "parents > cap" in str(e)
