"""HAC++ tests: channel-AR mixture round-trip, rate path, training step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gauspcc_tpu.codecs.gauspcgc import model as pcc_model
from gauspcc_tpu.models.hac import model as hac
from gauspcc_tpu.models.hac import render as hac_render
from gauspcc_tpu.models.hac_plus import codec as hacp_codec
from gauspcc_tpu.models.hac_plus import model as hacp
from gauspcc_tpu.models.hac_plus import render as hacp_render
from gauspcc_tpu.render import raster

CFG = hacp.HACPlusConfig(
    feat_dim=10,  # 5 chunks of 2
    n_offsets=3,
    voxel_size=0.05,
    resolutions_3d=(6, 10, 16),
    resolutions_2d=(16, 32),
    log2_hashmap_size=13,
    log2_hashmap_size_2d=13,
)
PCC_CFG = pcc_model.NetConfig(channels=8, kernel_size=3)


@pytest.fixture(scope="module")
def state():
    rng = np.random.default_rng(0)
    pts = hac.voxelize_points(
        (rng.random((400, 3)) * 2 - 1).astype(np.float32), CFG.voxel_size
    )
    st = hacp.init_state(jax.random.PRNGKey(0), CFG, pts)
    st = hac.update_anchor_bound(st)
    a = dict(st["anchors"])
    n = pts.shape[0]
    a["anchor_feat"] = a["anchor_feat"].at[:n].set(
        jnp.asarray(rng.normal(0, 0.5, (n, CFG.feat_dim)).astype(np.float32)))
    a["offset"] = a["offset"].at[:n].set(
        jnp.asarray(rng.normal(0, 0.3, (n, CFG.n_offsets, 3)).astype(np.float32)))
    return dict(st, anchors=a)


@pytest.fixture(scope="module")
def pcc_params():
    return pcc_model.init_params(jax.random.PRNGKey(7), PCC_CFG)


def test_channel_ctx_causality(state):
    """Chunk i's adjustment must not depend on chunks >= i."""
    rng = np.random.default_rng(1)
    feat = jnp.asarray(rng.normal(size=(16, CFG.feat_dim)).astype(np.float32))
    ms = jnp.asarray(rng.normal(size=(16, CFG.feat_dim * 3)).astype(np.float32))
    p = state["nets"]["channel_ctx"]
    m0, s0, p0 = hacp.channel_ctx_apply(p, CFG, feat, ms, to_dec=2)
    feat2 = feat.at[:, 2 * CFG.chunk:].set(99.0)  # corrupt chunks >= 2
    m1, s1, p1 = hacp.channel_ctx_apply(p, CFG, feat2, ms, to_dec=2)
    np.testing.assert_allclose(np.asarray(m0), np.asarray(m1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1))


def test_roundtrip(tmp_path, state, pcc_params):
    out_dir = str(tmp_path / "bs")
    sizes, log = hacp_codec.conduct_encoding(state, CFG, out_dir,
                                             pcc_params, PCC_CFG)
    assert sizes["total"] > 0
    dec_state, _ = hacp_codec.conduct_decoding(state, CFG, out_dir,
                                               pcc_params, PCC_CFG)
    base = CFG.as_hac()
    data = hacp_codec.hac_codec._gather_sorted_attributes(state, base)
    n = data["anchor_int"].shape[0]
    assert int(np.asarray(dec_state["valid"]).sum()) == n

    # features must round-trip to the encoder's quantized values exactly
    from gauspcc_tpu.core.quant import ste_multistep

    anchor_sorted = data["anchor_int"].astype(np.float32) * CFG.voxel_size
    got_feat = np.asarray(dec_state["anchors"]["anchor_feat"])[:n]
    for s in range((n + hacp_codec.BATCH - 1) // hacp_codec.BATCH):
        lo, hi = s * hacp_codec.BATCH, min((s + 1) * hacp_codec.BATCH, n)
        b = hi - lo
        batch_anchor = np.zeros((hacp_codec.BATCH, 3), np.float32)
        batch_anchor[:b] = anchor_sorted[lo:hi]
        ctx = jax.tree_util.tree_map(
            lambda x: x[:b],
            hacp_codec._batch_context(state, CFG, jnp.asarray(batch_anchor)),
        )
        want = np.asarray(ste_multistep(
            jnp.asarray(data["feat"][lo:hi]), ctx["q_feat"],
            jnp.float32(data["feat"].mean())))
        np.testing.assert_allclose(got_feat[lo:hi], want, atol=1e-4)


@pytest.mark.slow
def test_training_step_with_mixture_rate(state):
    params, rest = hac.split_state(state)
    rcfg = raster.RasterConfig(32, 32, 0.5, 0.5, max_gaussians_per_tile=32)
    cam = hac_render.CameraArrays(
        viewmatrix=jnp.eye(4),
        camera_center=jnp.zeros(3),
        image=jnp.zeros((3, 32, 32)),
    )
    m2d = jnp.zeros((rest["valid"].shape[0] * CFG.n_offsets, 2))
    loss, aux = hacp_render.training_loss(
        params, rest, CFG, cam, rcfg, jnp.zeros(3), 2,
        jax.random.PRNGKey(0), m2d, 1e-3,
    )
    assert np.isfinite(float(loss))
    assert float(aux["bit_per_param"]) > 0
    grads = jax.grad(
        lambda p: hacp_render.training_loss(
            p, rest, CFG, cam, rcfg, jnp.zeros(3), 2,
            jax.random.PRNGKey(0), m2d, 1e-3)[0]
    )(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # channel-ctx params must receive gradient
    g_ctx = jax.tree_util.tree_leaves(grads["nets"]["channel_ctx"])
    assert any(float(jnp.abs(g).max()) > 0 for g in g_ctx)
