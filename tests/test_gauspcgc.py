"""End-to-end GausPcgc codec tests: bit-exact round-trip, rate sanity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gauspcc_tpu.codecs.gauspcgc import codec, model


CFG = model.NetConfig(channels=16, kernel_size=3)


@pytest.fixture(scope="module")
def params():
    return model.init_params(jax.random.PRNGKey(0), CFG)


def _cloud(rng, n, extent=64, offset=(0, 0, 0)):
    pts = rng.integers(0, extent, size=(n * 2, 3)) + np.asarray(offset)
    pts = np.unique(pts, axis=0)
    return pts[:n].astype(np.int32)


def test_roundtrip_bit_exact(tmp_path, params):
    rng = np.random.default_rng(0)
    xyz = _cloud(rng, 1500, extent=128)
    out = codec.compress_point_cloud(xyz, params, str(tmp_path / "pc.bin"), config=CFG)
    assert out["num_points"] == xyz.shape[0]
    dec = codec.decompress_point_cloud(str(tmp_path / "pc.bin"), params, config=CFG)
    got = np.asarray(sorted(map(tuple, dec["point_cloud"].astype(np.int64).tolist())))
    want = np.asarray(sorted(map(tuple, xyz.astype(np.int64).tolist())))
    np.testing.assert_array_equal(got, want)


def test_roundtrip_negative_coords(tmp_path, params):
    rng = np.random.default_rng(1)
    xyz = _cloud(rng, 800, extent=96, offset=(-50, -7, -300))
    codec.compress_point_cloud(xyz, params, str(tmp_path / "pc.bin"), config=CFG)
    dec = codec.decompress_point_cloud(str(tmp_path / "pc.bin"), params, config=CFG)
    got = np.asarray(sorted(map(tuple, dec["point_cloud"].astype(np.int64).tolist())))
    want = np.asarray(sorted(map(tuple, xyz.astype(np.int64).tolist())))
    np.testing.assert_array_equal(got, want)


def test_roundtrip_posq(tmp_path, params):
    rng = np.random.default_rng(2)
    xyz = _cloud(rng, 500, extent=64) * 2  # even coords survive posQ=2 exactly
    codec.compress_point_cloud(xyz, params, str(tmp_path / "pc.bin"), posQ=2.0, config=CFG)
    dec = codec.decompress_point_cloud(str(tmp_path / "pc.bin"), params, config=CFG)
    got = np.asarray(sorted(map(tuple, dec["point_cloud"].astype(np.int64).tolist())))
    want = np.asarray(sorted(map(tuple, xyz.astype(np.int64).tolist())))
    np.testing.assert_array_equal(got, want)


def test_rate_reasonable_for_untrained_net(tmp_path, params):
    """Untrained (random-head) net: measured ~22 bpp on the occupancy tree —
    skewed-but-wrong softmax outputs cost more than uniform's ~9 bpp, but
    still far below the 96 bpp of raw int32 coords. Training tightens this;
    here we only guard against coder blow-ups."""
    rng = np.random.default_rng(3)
    xyz = _cloud(rng, 3000, extent=128)
    out = codec.compress_point_cloud(xyz, params, str(tmp_path / "pc.bin"), config=CFG)
    assert 1.0 < out["bpp"] < 50.0


@pytest.mark.slow
def test_level_bits_matches_actual_rate(tmp_path, params):
    """The training objective (teacher-forced bits) should closely track the
    real coded size — the estimate/actual oracle pair from SURVEY.md §4."""
    from gauspcc_tpu.ops import sparse

    rng = np.random.default_rng(4)
    xyz = _cloud(rng, 2000, extent=128)
    xyz0 = np.unique(xyz - xyz.min(axis=0), axis=0).astype(np.int32)
    levels = sparse.build_occupancy_pyramid(xyz0, min_points=codec.MIN_BASE_POINTS)

    est_bits = 0.0
    for d in range(len(levels) - 1):
        pcd, occ = levels[d]
        gt_coords, gt_occ = levels[d + 1]
        pc, po, pm = codec._pad_parents(pcd, occ)
        gt_pad = np.zeros(pc.shape[0] * 8, np.int32)
        gt_pad[: gt_occ.shape[0]] = gt_occ
        bits, n = model.level_bits(params, CFG, pc, po, pm, jnp.asarray(gt_pad))
        assert int(n) == gt_occ.shape[0]
        est_bits += float(bits)

    out = codec.compress_point_cloud(xyz0, params, str(tmp_path / "pc.bin"), config=CFG)
    # actual stream adds framing/header overhead; AC adds <=~32 bits/chunk
    coded_bits = out["file_size_bits"]
    assert coded_bits >= est_bits * 0.98
    assert coded_bits <= est_bits * 1.1 + 5000


def test_batch_roundtrip_bit_exact(tmp_path, params):
    """Merged-pyramid batch coding must recover every cloud losslessly
    (VERDICT r2 item 5: the TPU-first batched multi-cloud driver)."""
    rng = np.random.default_rng(3)
    clouds = [
        _cloud(rng, 700, extent=100),
        _cloud(rng, 400, extent=60, offset=(-20, 5, -90)),
        _cloud(rng, 1000, extent=128),
    ]
    path = str(tmp_path / "batch.binb")
    out = codec.compress_point_cloud_batch(clouds, params, path, config=CFG)
    assert out["num_clouds"] == 3
    assert out["num_points"] == sum(c.shape[0] for c in clouds)
    dec = codec.decompress_point_cloud_batch(path, params, config=CFG)
    assert len(dec["point_clouds"]) == 3
    for got_f, want in zip(dec["point_clouds"], clouds):
        got = np.asarray(sorted(map(tuple, got_f.astype(np.int64).tolist())))
        want_s = np.asarray(sorted(map(tuple, want.astype(np.int64).tolist())))
        np.testing.assert_array_equal(got, want_s)


def test_batch_rate_close_to_sequential(tmp_path, params):
    """Dyadic z-blocking must not leak rate across clouds: the batch file
    should cost about the same bits as the per-cloud files combined."""
    rng = np.random.default_rng(4)
    clouds = [_cloud(rng, 600, extent=80) for _ in range(3)]
    solo_bits = sum(
        codec.compress_point_cloud(
            c, params, str(tmp_path / f"s{i}.bin"), config=CFG
        )["file_size_bits"]
        for i, c in enumerate(clouds)
    )
    batch = codec.compress_point_cloud_batch(
        clouds, params, str(tmp_path / "b.binb"), config=CFG)
    assert batch["file_size_bits"] < solo_bits * 1.1


@pytest.mark.smoke
def test_device_geom_roundtrip_bit_exact(tmp_path, params):
    """v3 bitstream: geometry rebuilt on-device (fcg_expand + lex_sort +
    binary-search maps), per-level counts in the header, decode syncs only
    on the final coordinates. Lossless like v2."""
    rng = np.random.default_rng(7)
    xyz = _cloud(rng, 1500, extent=128, offset=(-9, 3, -17))
    out = codec.compress_point_cloud(
        xyz, params, str(tmp_path / "pc.bin"), config=CFG, geom="device")
    assert out["num_points"] == xyz.shape[0]
    dec = codec.decompress_point_cloud(str(tmp_path / "pc.bin"), params,
                                       config=CFG)
    got = np.unique(dec["point_cloud"].astype(np.int64), axis=0)
    want = np.unique(xyz.astype(np.int64), axis=0)
    np.testing.assert_array_equal(got, want)


def test_device_geom_matches_host_children():
    """The device child enumeration must reproduce the host builder's lex
    order exactly (the property the v3 coded-symbol alignment rests on)."""
    from gauspcc_tpu.ops import hostmap, sparse

    rng = np.random.default_rng(8)
    xyz = _cloud(rng, 2500, extent=64)
    xyz0 = np.unique(xyz - xyz.min(axis=0), axis=0).astype(np.int32)
    levels = sparse.build_occupancy_pyramid(xyz0, min_points=codec.MIN_BASE_POINTS)
    for d in range(len(levels) - 1):
        pcd, occ = levels[d]
        n_child = levels[d + 1][0].shape[0]
        pc, po, pm = codec._pad_parents(pcd, occ)
        ccap = min(codec._bucket(n_child), pc.shape[0] * 8)
        child, cm, octant, pidx = codec._device_children(pc, po, pm, ccap)
        child = np.asarray(child)[: n_child]
        np.testing.assert_array_equal(child, levels[d + 1][0])
        assert bool(np.all(np.asarray(cm)[:n_child]))
        assert not np.any(np.asarray(cm)[n_child:])


@pytest.mark.smoke
def test_batch_device_geom_roundtrip(tmp_path, params):
    """Batched bitstream with on-device geometry (v3): lossless per cloud."""
    rng = np.random.default_rng(11)
    clouds = [_cloud(rng, n, extent=96, offset=tuple(rng.integers(-20, 20, 3)))
              for n in (700, 1200, 900)]
    out = codec.compress_point_cloud_batch(
        clouds, params, str(tmp_path / "b.binb"), config=CFG, geom="device")
    assert out["num_clouds"] == 3
    dec = codec.decompress_point_cloud_batch(str(tmp_path / "b.binb"),
                                             params, config=CFG)
    for src, got in zip(clouds, dec["point_clouds"]):
        a = np.unique(src.astype(np.int64), axis=0)
        b = np.unique(got.astype(np.int64), axis=0)
        np.testing.assert_array_equal(a, b)


def test_host_geom_roundtrip_bit_exact(tmp_path, params):
    """The v2 host-window-map engine stays decodable (old bitstreams)."""
    rng = np.random.default_rng(21)
    xyz = _cloud(rng, 1500, extent=128)
    p = str(tmp_path / "pc_host.bin")
    codec.compress_point_cloud(xyz, params, p, config=CFG, geom="host")
    dec = codec.decompress_point_cloud(p, params, config=CFG)
    got = np.asarray(sorted(map(tuple, dec["point_cloud"].astype(np.int64).tolist())))
    np.testing.assert_array_equal(
        got, np.asarray(sorted(map(tuple, xyz.astype(np.int64).tolist()))))


@pytest.mark.slow
def test_sib_rate_matches_host(tmp_path, params):
    """The sib engine computes the same network, so its file size must be
    within rounding noise of the v2 engine's (same CDFs up to bf16
    reduction order)."""
    rng = np.random.default_rng(22)
    xyz = _cloud(rng, 2500, extent=96)
    a = codec.compress_point_cloud(
        xyz, params, str(tmp_path / "a.bin"), config=CFG, geom="sib")
    b = codec.compress_point_cloud(
        xyz, params, str(tmp_path / "b.bin"), config=CFG, geom="host")
    assert abs(a["bpp"] - b["bpp"]) / b["bpp"] < 0.02
