"""HAC scene bitstream round-trip: decoded attributes equal the encoder's
quantized values; estimate tracks actual size."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gauspcc_tpu.codecs.gauspcgc import model as pcc_model
from gauspcc_tpu.core.quant import ste_multistep
from gauspcc_tpu.models.hac import codec as hac_codec
from gauspcc_tpu.models.hac import model as hac

CFG = hac.HACConfig(
    feat_dim=8,
    n_offsets=3,
    voxel_size=0.05,
    resolutions_3d=(6, 10, 16),
    resolutions_2d=(16, 32),
    log2_hashmap_size=13,
    log2_hashmap_size_2d=13,
)
PCC_CFG = pcc_model.NetConfig(channels=8, kernel_size=3)


@pytest.fixture(scope="module")
def trained_like_state():
    rng = np.random.default_rng(0)
    pts = hac.voxelize_points(
        (rng.random((500, 3)) * 2 - 1).astype(np.float32), CFG.voxel_size
    )
    key = jax.random.PRNGKey(0)
    state = hac.init_state(key, CFG, pts)
    state = hac.update_anchor_bound(state)
    # perturb attributes so the streams are non-trivial
    a = dict(state["anchors"])
    n = pts.shape[0]
    a["anchor_feat"] = a["anchor_feat"].at[:n].set(
        jnp.asarray(rng.normal(0, 0.5, (n, CFG.feat_dim)).astype(np.float32))
    )
    a["offset"] = a["offset"].at[:n].set(
        jnp.asarray(rng.normal(0, 0.3, (n, CFG.n_offsets, 3)).astype(np.float32))
    )
    a["mask"] = a["mask"].at[:n].set(
        jnp.asarray(rng.normal(1.0, 2.0, (n, CFG.n_offsets, 1)).astype(np.float32))
    )
    state = dict(state, anchors=a)
    return state


@pytest.fixture(scope="module")
def pcc_params():
    return pcc_model.init_params(jax.random.PRNGKey(7), PCC_CFG)


def test_encode_decode_roundtrip(tmp_path, trained_like_state, pcc_params):
    state = trained_like_state
    out_dir = str(tmp_path / "bitstream")
    sizes, log = hac_codec.conduct_encoding(state, CFG, out_dir, pcc_params, PCC_CFG)
    assert sizes["total"] > 0 and "EncTime" in log

    dec_state, dlog = hac_codec.conduct_decoding(
        state, CFG, out_dir, pcc_params, PCC_CFG
    )

    # reproduce the encoder's quantized ground truth
    data = hac_codec._gather_sorted_attributes(state, CFG)
    n = data["anchor_int"].shape[0]
    dn = int(np.asarray(dec_state["valid"]).sum())
    assert dn == n

    # anchors: exact voxel positions
    np.testing.assert_allclose(
        np.asarray(dec_state["anchors"]["anchor"])[:n],
        data["anchor_int"].astype(np.float32) * CFG.voxel_size,
        atol=1e-6,
    )
    # masks: exact
    np.testing.assert_array_equal(
        np.asarray(dec_state["anchors"]["mask"])[:n], data["mask"]
    )
    # hash tables: exact signs
    from gauspcc_tpu.fields import hashgrid
    from gauspcc_tpu.core.quant import ste_binary

    want = np.asarray(ste_binary(hashgrid.flat_tables(state["nets"]["tables"])))
    got = np.asarray(hashgrid.flat_tables(dec_state["nets"]["tables"]))
    np.testing.assert_array_equal(got, want)

    # attributes: match the quantized values the encoder wrote
    anchor_sorted = data["anchor_int"].astype(np.float32) * CFG.voxel_size
    got_feat = np.asarray(dec_state["anchors"]["anchor_feat"])[:n]
    got_scaling = np.asarray(dec_state["anchors"]["scaling"])[:n]
    got_offset = np.asarray(dec_state["anchors"]["offset"])[:n]

    for s in range((n + hac_codec.BATCH - 1) // hac_codec.BATCH):
        lo, hi = s * hac_codec.BATCH, min((s + 1) * hac_codec.BATCH, n)
        b = hi - lo
        batch_anchor = np.zeros((hac_codec.BATCH, 3), np.float32)
        batch_anchor[:b] = anchor_sorted[lo:hi]
        ctx = jax.tree_util.tree_map(
            lambda x: np.asarray(x)[:b],
            hac_codec._batch_context(state, CFG, jnp.asarray(batch_anchor)),
        )
        want_feat = np.asarray(ste_multistep(
            jnp.asarray(data["feat"][lo:hi]), jnp.asarray(ctx["q_feat"]),
            jnp.float32(data["feat"].mean())))
        np.testing.assert_allclose(got_feat[lo:hi], want_feat, atol=1e-4)

        want_scaling = np.asarray(ste_multistep(
            jnp.asarray(data["scaling"][lo:hi]), jnp.asarray(ctx["q_scaling"]),
            jnp.float32(data["scaling"].mean())))
        np.testing.assert_allclose(got_scaling[lo:hi], want_scaling, atol=1e-5)

        want_off = np.asarray(ste_multistep(
            jnp.asarray(data["offset"][lo:hi]),
            jnp.asarray(ctx["q_offsets"][:, None, :]),
            jnp.float32(data["offset"].mean())))
        want_off = want_off * data["mask"][lo:hi].repeat(3, -1).reshape(b, CFG.n_offsets, 3)
        np.testing.assert_allclose(got_offset[lo:hi], want_off, atol=1e-4)


def test_estimate_tracks_actual(tmp_path, trained_like_state, pcc_params):
    state = trained_like_state
    est, _ = hac_codec.estimate_final_bits(state, CFG)
    sizes, _ = hac_codec.conduct_encoding(
        state, CFG, str(tmp_path / "bs"), pcc_params, PCC_CFG
    )
    # attribute streams should be within ~25% of the analytic estimate
    for key in ("feat", "scaling"):
        ratio = sizes[key] / max(est[key], 1.0)
        assert 0.7 < ratio < 1.35, (key, sizes[key], est[key])
