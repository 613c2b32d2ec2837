"""Multi-scale SSIM (Wang et al. 2003) — the progressive-growing paper's
second evaluation metric (Karras et al. 2018 §5 uses the mean MS-SSIM among
random pairs of GENERATED images as a mode-collapse indicator: a collapsing
generator emits near-duplicate samples, driving pairwise similarity up).

The reference framework ships no metric at all; together with metrics/swd.py
this closes that gap. TPU-native design: the 11x11 Gaussian window runs as
two rank-1 depthwise convs (VALID padding, per the original paper), scales
are a fixed unrolled pyramid of 2x2 average pools, and the whole pairwise
score is one jitted fixed-shape program over an (N, H, W, C) batch of image
pairs — no data-dependent shapes, everything fuses.

Inputs follow the training dynamic range [-1, 1] and are remapped to [0, 1]
internally (L = 1, K1 = 0.01, K2 = 0.03 — the standard constants).

Scale handling: the canonical 5 scales need min(H, W) >= 176 (the 11-tap
window must fit after four 2x downsamples). For smaller images the scale
count is reduced to what fits and the per-scale exponents are renormalized
to keep the score in [0, 1] — documented, deterministic, and the same rule
for both sets being compared.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

# per-scale exponents from the MS-SSIM paper (sum to 1)
_WEIGHTS = np.array([0.0448, 0.2856, 0.3001, 0.2363, 0.1333], np.float64)
_WINDOW = 11
_SIGMA = 1.5


def _gaussian1d(size: int = _WINDOW, sigma: float = _SIGMA) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    k = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


def _blur_valid(x: jnp.ndarray, k1d: jnp.ndarray) -> jnp.ndarray:
    """Separable depthwise Gaussian, VALID padding, NHWC."""
    c = x.shape[-1]
    kh = jnp.tile(k1d.reshape(-1, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(k1d.reshape(1, -1, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=c)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=c)
    return x


def _avg_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    n, h, w, c = x.shape
    return x[:, :h - h % 2, :w - w % 2, :].reshape(
        n, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def _ssim_parts(a, b, k1d, c1, c2):
    """Per-image (luminance, contrast-structure) means over all windows and
    channels. Uses the standard moment identities so each statistic is one
    blurred tensor."""
    mu_a = _blur_valid(a, k1d)
    mu_b = _blur_valid(b, k1d)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    var_a = _blur_valid(a * a, k1d) - mu_aa
    var_b = _blur_valid(b * b, k1d) - mu_bb
    cov = _blur_valid(a * b, k1d) - mu_ab
    lum = (2.0 * mu_ab + c1) / (mu_aa + mu_bb + c1)
    cs = (2.0 * cov + c2) / (var_a + var_b + c2)
    return lum.mean(axis=(1, 2, 3)), cs.mean(axis=(1, 2, 3))


def n_scales(resolution: int, max_scales: int = 5) -> int:
    """How many pyramid scales fit: the 11-tap window must fit at the
    coarsest scale (min side // 2**(n-1) >= 11)."""
    n = 1
    while (n < max_scales
           and resolution // 2 ** n >= _WINDOW):
        n += 1
    return n


@partial(jax.jit, static_argnames=("scales",))
def _msssim_scored(a: jnp.ndarray, b: jnp.ndarray, scales: int):
    k1d = jnp.asarray(_gaussian1d())
    # [-1, 1] -> [0, 1]; L = 1
    a = (a + 1.0) * 0.5
    b = (b + 1.0) * 0.5
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    weights = _WEIGHTS[:scales] / _WEIGHTS[:scales].sum()
    score = jnp.ones((a.shape[0],), jnp.float32)
    for j in range(scales):
        lum, cs = _ssim_parts(a, b, k1d, c1, c2)
        # negative cs values (possible on weird inputs) are clamped so the
        # fractional exponents stay real; standard implementations do the same
        term = cs if j < scales - 1 else lum * cs
        score = score * jnp.maximum(term, 0.0) ** weights[j]
        if j < scales - 1:
            a, b = _avg_pool_2x(a), _avg_pool_2x(b)
    return score


def msssim(a, b, max_scales: int = 5) -> np.ndarray:
    """Per-pair MS-SSIM scores for two NHWC image batches in [-1, 1].
    Returns an (N,) float array in [0, 1] (1 = identical)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    assert a.shape == b.shape and a.ndim == 4, (a.shape, b.shape)
    res = min(a.shape[1], a.shape[2])
    if res < _WINDOW:
        raise ValueError(
            f"images are {a.shape[1]}x{a.shape[2]} but MS-SSIM's "
            f"{_WINDOW}-tap window needs at least {_WINDOW}x{_WINDOW}")
    return np.asarray(_msssim_scored(a, b, n_scales(res, max_scales)))


def pairwise_msssim(images, key=None, max_scales: int = 5,
                    minibatch: int = 32) -> float:
    """Mean MS-SSIM over a random disjoint pairing of one image set — the
    paper's mode-collapse statistic (higher = samples more alike; a healthy
    generator scores close to the real data's own pairing).

    Images are shuffled once (``key``), split into halves, and scored pair
    ``i`` = (half1[i], half2[i]) streaming in ``minibatch`` chunks.
    """
    images = np.asarray(images, np.float32)
    n = images.shape[0] // 2 * 2
    if key is None:
        key = jax.random.PRNGKey(0)
    perm = np.asarray(jax.random.permutation(key, n))
    a, b = images[perm[:n // 2]], images[perm[n // 2:n]]
    scores = []
    for i in range(0, n // 2, minibatch):
        scores.append(msssim(a[i:i + minibatch], b[i:i + minibatch],
                             max_scales))
    return float(np.mean(np.concatenate(scores)))
