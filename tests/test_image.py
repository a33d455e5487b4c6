"""Image metric tests: SSIM bounds/values, PSNR, L1.

The SSIM bound test exists because of a TPU-only failure mode: XLA lowers
f32 convolutions to bf16 multiplies by default, which corrupts the
E[x^2]-mu^2 variance cancellation near bright pixels and sent the per-pixel
SSIM map to +-10^3 (diverging any DSSIM-weighted training). utils/image.py
forces Precision.HIGHEST in its filters; these tests pin the contract on
whatever backend they run on.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gauspcc_tpu.utils import image as img_lib

pytestmark = pytest.mark.smoke


def _bright_pair(seed=0, hw=96):
    """Near-identical bright images (the cancellation-hostile regime)."""
    rng = np.random.default_rng(seed)
    gt = 0.9 + 0.1 * rng.random((3, hw, hw)).astype(np.float32)
    noisy = np.clip(gt + rng.normal(0, 0.01, gt.shape).astype(np.float32), 0, 1)
    return jnp.asarray(noisy), jnp.asarray(gt)


def test_ssim_bounded_on_bright_images():
    a, b = _bright_pair()
    v = float(img_lib.ssim(a, b))
    # mean SSIM of a 1%-noise bright image must be high and essentially <= 1
    # (zero-padded borders can exceed 1 by a hair, matching the upstream
    # torch implementation's padding semantics)
    assert 0.5 < v <= 1.0 + 1e-3, v


def test_ssim_identity_is_one():
    a, _ = _bright_pair(1)
    v = float(img_lib.ssim(a, a))
    assert abs(v - 1.0) < 1e-3, v


def test_ssim_orders_degradations():
    a, gt = _bright_pair(2)
    rng = np.random.default_rng(3)
    worse = np.clip(
        np.asarray(gt) + rng.normal(0, 0.1, gt.shape).astype(np.float32), 0, 1)
    assert float(img_lib.ssim(a, gt)) > float(img_lib.ssim(jnp.asarray(worse), gt))


def test_ssim_variance_nonnegative_in_filter():
    # direct check of the failure mode: local variance from the filtered
    # moments must not go below -1e-5 anywhere on a bright image
    a, _ = _bright_pair(4)
    win = img_lib._gaussian_window()
    mu = img_lib._filter2d(a, win)
    var = img_lib._filter2d(a * a, win) - mu * mu
    assert float(jnp.min(var)) > -1e-5


def test_psnr_matches_closed_form():
    a = jnp.zeros((3, 8, 8))
    b = jnp.full((3, 8, 8), 0.1)
    assert abs(float(img_lib.psnr(a, b)) - 20.0) < 1e-4


def test_l1():
    a = jnp.zeros((3, 4, 4))
    b = jnp.full((3, 4, 4), 0.25)
    assert abs(float(img_lib.l1_loss(a, b)) - 0.25) < 1e-6
