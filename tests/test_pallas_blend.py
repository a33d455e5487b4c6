"""Pallas tile-blend kernel vs a pure-numpy reference (interpret mode on
CPU; the same program compiles for TPU via Mosaic)."""

import numpy as np
import jax.numpy as jnp

from gauspcc_tpu.render import pallas_blend


def _reference(origins, records, colors, bg):
    t, k, _ = records.shape
    out = np.zeros((t, 256, 4), np.float32)
    for ti in range(t):
        ox, oy = origins[ti]
        for p in range(256):
            px = ox + p % 16
            py = oy + p // 16
            t_run = 1.0
            acc = np.zeros(4)
            for g in range(k):
                mx, my, ca, cb, cc, opa, _, _ = records[ti, g]
                dx, dy = px - mx, py - my
                power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
                a = min(0.99, opa * np.exp(min(power, 0.0)))
                if a < 1.0 / 255.0:
                    a = 0.0
                if t_run >= 1e-4:
                    acc += a * t_run * colors[ti, g]
                t_run *= 1.0 - a
            out[ti, p] = acc + t_run * bg
    return out


def test_blend_matches_reference():
    rng = np.random.default_rng(0)
    t, k = 3, pallas_blend.KCHUNK
    origins = (rng.integers(0, 4, (t, 2)) * 16).astype(np.float32)
    records = np.zeros((t, k, 8), np.float32)
    records[:, :, 0] = origins[:, 0:1] + rng.uniform(0, 16, (t, k))  # mx
    records[:, :, 1] = origins[:, 1:2] + rng.uniform(0, 16, (t, k))  # my
    records[:, :, 2] = rng.uniform(0.05, 0.3, (t, k))  # conic a
    records[:, :, 3] = rng.uniform(-0.02, 0.02, (t, k))  # conic b
    records[:, :, 4] = rng.uniform(0.05, 0.3, (t, k))  # conic c
    records[:, :, 5] = rng.uniform(0.1, 0.9, (t, k))  # opacity
    colors = np.zeros((t, k, 4), np.float32)
    colors[:, :, :3] = rng.uniform(0, 1, (t, k, 3))
    bg = np.array([0.1, 0.2, 0.3, 0.0], np.float32)

    got = np.asarray(pallas_blend.blend_tiles(
        jnp.asarray(origins), jnp.asarray(records), jnp.asarray(colors),
        jnp.asarray(bg), interpret=True))
    want = _reference(origins, records, colors, bg)
    np.testing.assert_allclose(got[:, :, :3], want[:, :, :3], rtol=2e-4, atol=2e-5)


def test_rasterize_pallas_path_matches_xla_interpret(monkeypatch):
    """Full rasterize with use_pallas_blend (interpret mode on CPU) matches
    the XLA blend path."""
    import jax
    from gauspcc_tpu.render import pallas_blend, raster

    orig = pallas_blend.blend_tiles

    def interp_blend(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pallas_blend, "blend_tiles", interp_blend)

    rng = np.random.default_rng(1)
    n = 40
    means = (rng.random((n, 3)) * 1.2 - 0.6).astype(np.float32)
    means[:, 2] += 5.0
    colors = rng.random((n, 3)).astype(np.float32)
    opac = np.full((n, 1), 0.7, np.float32)
    scales = np.full((n, 3), 0.15, np.float32)
    rots = np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32)
    view = jnp.eye(4)
    bg = jnp.asarray([0.2, 0.1, 0.0])

    cfg_x = raster.RasterConfig(48, 64, 0.5, 0.5, max_gaussians_per_tile=64,
                                blend_bf16=False)  # the kernel computes f32
    cfg_p = cfg_x._replace(use_pallas_blend=True)
    args = dict(means3d=jnp.asarray(means), colors=jnp.asarray(colors),
                opacities=jnp.asarray(opac), scales=jnp.asarray(scales),
                rotations=jnp.asarray(rots), viewmatrix=view, bg_color=bg)
    img_x, _ = raster.rasterize(cfg=cfg_x, **args)
    img_p, _ = raster.rasterize(cfg=cfg_p, **args)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_x),
                               rtol=2e-4, atol=2e-5)
