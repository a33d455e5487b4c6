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
