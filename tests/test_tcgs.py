"""TC-GS tests: triplane sampling, AE, loss/gradients, bitstream round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gauspcc_tpu.codecs.gauspcgc import model as pcc_model
from gauspcc_tpu.fields import triplane as tri
from gauspcc_tpu.models.hac import model as hac
from gauspcc_tpu.models.hac import render as hac_render
from gauspcc_tpu.models.tcgs import codec as tcgs_codec
from gauspcc_tpu.models.tcgs import model as tcgs
from gauspcc_tpu.models.tcgs import render as tcgs_render
from gauspcc_tpu.render import raster

CFG = tcgs.TCGSConfig(
    feat_dim=8, n_offsets=3, voxel_size=0.05,
    tri_feat=4, tri_res=16, tri_samples=2, ae_compressed=4,
)
PCC_CFG = pcc_model.NetConfig(channels=8, kernel_size=3)


def test_grid_sample_matches_manual():
    plane = jnp.arange(2 * 4 * 4, dtype=jnp.float32).reshape(2, 4, 4)
    # uv = (0,0) -> pixel center between (1.5,1.5): average of 4 centers
    out = tri.grid_sample_2d(plane, jnp.asarray([[0.0, 0.0]]))
    manual = plane[:, 1:3, 1:3].mean(axis=(1, 2))
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(manual), rtol=1e-6)
    # far outside -> zeros
    out2 = tri.grid_sample_2d(plane, jnp.asarray([[5.0, 5.0]]))
    np.testing.assert_allclose(np.asarray(out2), 0.0)


def test_contract_identity_inside():
    x = jnp.asarray([[0.3, 0.1, -0.2]])
    np.testing.assert_allclose(np.asarray(tri.contract(x)), np.asarray(x))
    far = jnp.asarray([[10.0, 0.0, 0.0]])
    out = np.asarray(tri.contract(far))
    assert np.linalg.norm(out) < 2.0  # contracted into radius-2 ball


@pytest.mark.slow
def test_autoencoder_shapes_and_grads():
    cfg = tri.AEConfig(feat=4, compressed_dim=4)
    params = tri.init_autoencoder(jax.random.PRNGKey(0), cfg)
    planes = jax.random.normal(jax.random.PRNGKey(1), (3, 4, 16, 16))
    latent, recon = tri.autoencode(params, planes)
    assert latent.shape == (3, 4, 2, 2)
    assert recon.shape == planes.shape
    g = jax.grad(lambda p: jnp.mean(
        (tri.autoencode(p, planes)[1] - jax.nn.sigmoid(planes)) ** 2
    ))(params)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))
    # decode_latent consistency
    recon2 = tri.decode_latent(params, latent)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(recon2), atol=1e-6)


@pytest.fixture(scope="module")
def state():
    rng = np.random.default_rng(0)
    pts = hac.voxelize_points(
        (rng.random((300, 3)) * 2 - 1).astype(np.float32), CFG.voxel_size)
    st = tcgs.init_state(jax.random.PRNGKey(0), CFG, pts)
    st = hac.update_anchor_bound(st)
    a = dict(st["anchors"])
    n = pts.shape[0]
    a["anchor_feat"] = a["anchor_feat"].at[:n].set(
        jnp.asarray(rng.normal(0, 0.5, (n, CFG.feat_dim)).astype(np.float32)))
    return dict(st, anchors=a)


@pytest.mark.slow
def test_training_loss_phases(state):
    params, rest = hac.split_state(state)
    rcfg = raster.RasterConfig(32, 32, 0.5, 0.5, max_gaussians_per_tile=32)
    cam = hac_render.CameraArrays(
        viewmatrix=jnp.eye(4), camera_center=jnp.zeros(3),
        image=jnp.zeros((3, 32, 32)))
    m2d = jnp.zeros((rest["valid"].shape[0] * CFG.n_offsets, 2))
    for phase in (0, 2, 3):
        loss, aux = tcgs_render.training_loss(
            params, rest, CFG, cam, rcfg, jnp.zeros(3), phase,
            jax.random.PRNGKey(0), m2d, 1e-3)
        assert np.isfinite(float(loss)), phase
        if phase >= 2:
            assert float(aux["bit_per_param"]) > 0
        if phase >= 3:
            assert float(aux["lae"]) > 0
    # planes + AE + mlp_triplane get gradients at phase 3
    g = jax.grad(lambda p: tcgs_render.training_loss(
        p, rest, CFG, cam, rcfg, jnp.zeros(3), 3,
        jax.random.PRNGKey(0), m2d, 1e-3)[0])(params)
    assert float(jnp.abs(jnp.stack(
        [jnp.abs(l).max() for l in jax.tree_util.tree_leaves(
            g["nets"]["planes"])])).max()) > 0
    assert any(float(jnp.abs(l).max()) > 0
               for l in jax.tree_util.tree_leaves(g["nets"]["autoencoder"]))


def test_bitstream_roundtrip(tmp_path, state):
    pcc_params = pcc_model.init_params(jax.random.PRNGKey(5), PCC_CFG)
    out_dir = str(tmp_path / "bs")
    sizes, _ = tcgs_codec.conduct_encoding(state, CFG, out_dir,
                                           pcc_params, PCC_CFG)
    assert sizes["triplane"] > 0
    dec_state, _ = tcgs_codec.conduct_decoding(state, CFG, out_dir,
                                               pcc_params, PCC_CFG)
    n = int(np.asarray(dec_state["valid"]).sum())
    data = tcgs_codec.hac_codec._gather_sorted_attributes(state, CFG.as_hac())
    assert n == data["anchor_int"].shape[0]
    # anchors exact; feat finite and close to quantized originals
    np.testing.assert_allclose(
        np.asarray(dec_state["anchors"]["anchor"])[:n],
        data["anchor_int"].astype(np.float32) * CFG.voxel_size, atol=1e-6)
    got = np.asarray(dec_state["anchors"]["anchor_feat"])[:n]
    assert np.isfinite(got).all()
    # quantization error bounded by the max adaptive Q (q_feat <= 2)
    assert np.abs(got - data["feat"]).max() <= 2.0 * 0.5 + 1e-4


def test_knn_self_positions_equal_repeat_mode():
    """knn_pos = the anchor repeated == the repeat-mode context exactly."""
    rng = np.random.default_rng(5)
    pts = hac.voxelize_points(
        (rng.random((200, 3)) * 2 - 1).astype(np.float32), CFG.voxel_size)
    st = tcgs.init_state(jax.random.PRNGKey(0), CFG, pts)
    st = hac.update_anchor_bound(st)
    anchor = hac.get_anchor(st, CFG.as_hac())
    self_pos = jnp.repeat(anchor[:, None, :], CFG.tri_samples, axis=1)
    a = tcgs.triplane_context(st, CFG, anchor)
    b = tcgs.triplane_context(st, CFG, anchor, knn_pos=self_pos)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_knn_positions_orders_by_distance():
    pts = np.array([[0.0, 0, 0], [1.0, 0, 0], [5.0, 0, 0]], np.float32)
    pos = tcgs.knn_positions(pts, 2)
    assert pos.shape == (3, 2, 3)
    np.testing.assert_allclose(pos[0, 0], pts[0])  # self first
    np.testing.assert_allclose(pos[0, 1], pts[1])  # then nearest
    np.testing.assert_allclose(pos[2, 1], pts[1])


@pytest.mark.slow
def test_knn_mode_scene_roundtrip(tmp_path):
    """Full scene bitstream round-trip with knn_sampling=True: decoder
    re-derives the same knn positions from the decoded anchors."""
    cfg = CFG._replace(knn_sampling=True)
    rng = np.random.default_rng(6)
    pts = hac.voxelize_points(
        (rng.random((250, 3)) * 2 - 1).astype(np.float32), cfg.voxel_size)
    st = tcgs.init_state(jax.random.PRNGKey(1), cfg, pts)
    st = hac.update_anchor_bound(st)
    a = dict(st["anchors"])
    n = pts.shape[0]
    a["anchor_feat"] = a["anchor_feat"].at[:n].set(
        jnp.asarray(rng.normal(0, 0.5, (n, cfg.feat_dim)).astype(np.float32)))
    st = dict(st, anchors=a)
    pcc_params = pcc_model.init_params(jax.random.PRNGKey(2), PCC_CFG)
    out = str(tmp_path / "bs")
    sizes, _ = tcgs_codec.conduct_encoding(st, cfg, out, pcc_params, PCC_CFG)
    dec_state, _ = tcgs_codec.conduct_decoding(st, cfg, out, pcc_params, PCC_CFG)
    data = tcgs_codec.hac_codec._gather_sorted_attributes(st, cfg.as_hac())
    assert int(np.asarray(dec_state["valid"]).sum()) == data["anchor_int"].shape[0]
    got = np.asarray(dec_state["anchors"]["anchor_feat"])[:data["anchor_int"].shape[0]]
    assert np.isfinite(got).all()
    assert np.abs(got - data["feat"]).max() <= 2.0 * 0.5 + 1e-4
