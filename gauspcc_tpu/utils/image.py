"""Image losses/metrics in JAX: L1, PSNR, SSIM (11x11 Gaussian window).

Parity: HAC/utils/loss_utils.py (l1_loss, ssim with window=11, sigma=1.5,
C1=0.01^2, C2=0.03^2) and utils/image_utils.py (psnr).
Images are [C, H, W] in [0, 1].
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def l1_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(a - b))


def psnr(a: jax.Array, b: jax.Array) -> jax.Array:
    mse = jnp.mean((a - b) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _filter2d(img: jax.Array, win: np.ndarray) -> jax.Array:
    """Separable same-padded convolution over [C, H, W].

    Precision MUST be HIGHEST: on TPU, XLA lowers f32 convolutions to
    bf16 multiplies by default, which puts ~1e-3 noise on E[x^2] near 1.0.
    SSIM's variance E[x^2]-mu^2 then cancels to garbage on the same order
    as C2=9e-4, the per-pixel map blows up to +-10^3, and the DSSIM loss
    term diverges training (measured: HAC soak stalls at ~13 dB vs 40 dB
    without the term; full f32 filters fix it)."""
    k = jnp.asarray(win)
    pad = len(win) // 2
    hi = jax.lax.Precision.HIGHEST

    def conv1d(x, axis):
        x = jnp.moveaxis(x, axis, -1)
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)])
        out = jax.vmap(
            lambda row: jnp.convolve(row, k, mode="valid", precision=hi)
        )(xp.reshape(-1, xp.shape[-1])).reshape(x.shape)
        return jnp.moveaxis(out, -1, axis)

    return conv1d(conv1d(img, 1), 2)


def ssim(a: jax.Array, b: jax.Array, c1: float = 0.01**2, c2: float = 0.03**2
         ) -> jax.Array:
    win = _gaussian_window()
    mu_a = _filter2d(a, win)
    mu_b = _filter2d(b, win)
    mu_aa = mu_a * mu_a
    mu_bb = mu_b * mu_b
    mu_ab = mu_a * mu_b
    sigma_aa = _filter2d(a * a, win) - mu_aa
    sigma_bb = _filter2d(b * b, win) - mu_bb
    sigma_ab = _filter2d(a * b, win) - mu_ab
    m = ((2 * mu_ab + c1) * (2 * sigma_ab + c2)) / (
        (mu_aa + mu_bb + c1) * (sigma_aa + sigma_bb + c2)
    )
    return jnp.mean(m)
