"""LPIPS perceptual metric in JAX (VGG16 feature distance + linear heads).

Parity: the reference's vendored lpipsPyTorch (HAC/lpipsPyTorch/modules/
lpips.py: VGG16 conv features at relu{1_2, 2_2, 3_3, 4_3, 5_3},
unit-normalized per channel, squared differences through 1x1 linear
heads, spatially averaged and summed).

This environment has no torchvision and no network egress, so pretrained
VGG weights cannot be fetched. The metric therefore loads weights from a
local .npz (keys: conv{i}_w [kh,kw,cin,cout], conv{i}_b, lin{j}_w [c])
placed at gauspcc_tpu/utils/lpips_vgg.npz or given explicitly; when
absent, callers treat LPIPS as unavailable (results.json reports null,
as flagged in models/hac/pipeline.py).

To export weights on a machine with torchvision:
    import torchvision, numpy as np
    vgg = torchvision.models.vgg16(weights='IMAGENET1K_V1').features
    ... save conv weights transposed to [kh, kw, cin, cout] ...
plus the lpips 'lin' head weights from the official lpips package.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

# VGG16 conv layout: (out_channels, n_convs) per block
_BLOCKS = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_DEFAULT_PATH = os.path.join(os.path.dirname(__file__), "lpips_vgg.npz")


def _conv(x, w, b):
    # x [N,H,W,C]; w [kh,kw,cin,cout]
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b


def _normalize(x):
    return x / jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-10)


def make_lpips(weights: dict):
    """Build lpips(a, b) from a weights dict; images [3, H, W] in [0, 1]."""

    def features(img):
        x = img.transpose(1, 2, 0)[None]  # [1,H,W,3]
        x = (x * 2.0 - 1.0 - _SHIFT) / _SCALE
        feats = []
        ci = 0
        for bi, (cout, n_convs) in enumerate(_BLOCKS):
            for _ in range(n_convs):
                x = jax.nn.relu(_conv(x, weights[f"conv{ci}_w"], weights[f"conv{ci}_b"]))
                ci += 1
            feats.append(x)
            if bi < len(_BLOCKS) - 1:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                )
        return feats

    @jax.jit
    def lpips(a, b):
        fa = features(a)
        fb = features(b)
        total = 0.0
        for j, (xa, xb) in enumerate(zip(fa, fb)):
            d = (_normalize(xa) - _normalize(xb)) ** 2
            lin = weights[f"lin{j}_w"]  # [C]
            total = total + jnp.mean(jnp.sum(d * lin[None, None, None, :], axis=-1))
        return total

    return lpips


def load_default_lpips(path: str | None = None,
                       allow_surrogate: bool = True):
    """Returns a jitted lpips fn with a `.variant` attribute.

    Resolution order: explicit `path` arg, $GAUSPCC_LPIPS_WEIGHTS, then
    gauspcc_tpu/utils/lpips_vgg.npz. When no weights file exists and
    `allow_surrogate`, falls back to the seeded random-feature surrogate
    (variant "vgg_random_v1"): deterministic across runs/machines, useful
    as a relative perceptual distance (random conv features are a known
    perceptual-metric baseline) but NOT calibrated to published LPIPS —
    consumers must check `.variant` before comparing against papers."""
    if path is None:
        path = os.environ.get("GAUSPCC_LPIPS_WEIGHTS", _DEFAULT_PATH)
    if os.path.exists(path):
        data = np.load(path)
        weights = {k: jnp.asarray(data[k]) for k in data.files}
        variant = "vgg16_pretrained"
    elif allow_surrogate:
        weights = {k: jnp.asarray(v) for k, v in random_weights(1234).items()}
        variant = "vgg_random_v1"
    else:
        raise FileNotFoundError(path)
    jitted = make_lpips(weights)

    def fn(a, b):
        return jitted(a, b)

    fn.variant = variant  # plain wrapper: jit's C++ callable rejects attrs
    return fn


def random_weights(seed: int = 0) -> dict:
    """Random-but-fixed VGG16+lin weights with the exact real layout.

    Proves the metric plumbing (shape/layout/jit) without pretrained
    weights; numbers are NOT perceptual. Save with np.savez to produce a
    loadable weights file for tests or air-gapped smoke runs.
    """
    rng = np.random.default_rng(seed)
    weights = {}
    cin = 3
    ci = 0
    for cout, n_convs in _BLOCKS:
        for _ in range(n_convs):
            std = np.sqrt(2.0 / (9 * cin))
            weights[f"conv{ci}_w"] = rng.normal(
                0, std, (3, 3, cin, cout)
            ).astype(np.float32)
            weights[f"conv{ci}_b"] = np.zeros(cout, np.float32)
            cin = cout
            ci += 1
    for j, (cout, _) in enumerate(_BLOCKS):
        weights[f"lin{j}_w"] = rng.uniform(0, 1, cout).astype(np.float32)
    return weights
