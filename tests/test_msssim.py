"""MS-SSIM metric tests (metrics/msssim.py): identity, monotonicity under
degradation, scale-count law, and parity against an independent NumPy
implementation of Wang et al. 2003."""

import numpy as np
import pytest

import jax

from pggan_tpu.metrics.msssim import (
    _WEIGHTS,
    _gaussian1d,
    msssim,
    n_scales,
    pairwise_msssim,
)


def _images(n, res, c=1, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, res, res, c).astype(np.float32)
    # smooth a bit so SSIM statistics are non-degenerate
    x = (x + np.roll(x, 1, 1) + np.roll(x, 1, 2)) / 3.0
    return np.clip(x, -1, 1)


# ------------------------------------------------------------- numpy oracle

def _np_blur_valid(x, k):
    """Separable VALID gaussian over (H, W) of an HWC image, float64."""
    from numpy.lib.stride_tricks import sliding_window_view
    win = len(k)
    xh = sliding_window_view(x, win, axis=0)  # (H-w+1, W, C, win)
    x = np.einsum("hwcf,f->hwc", xh, k)
    xw = sliding_window_view(x, win, axis=1)
    return np.einsum("hwcf,f->hwc", xw, k)


def _np_msssim_single(a, b, scales):
    """Direct float64 MS-SSIM of one HWC pair in [-1, 1]."""
    k = _gaussian1d().astype(np.float64)
    a = (a.astype(np.float64) + 1.0) * 0.5
    b = (b.astype(np.float64) + 1.0) * 0.5
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    w = _WEIGHTS[:scales] / _WEIGHTS[:scales].sum()
    score = 1.0
    for j in range(scales):
        mu_a, mu_b = _np_blur_valid(a, k), _np_blur_valid(b, k)
        var_a = _np_blur_valid(a * a, k) - mu_a ** 2
        var_b = _np_blur_valid(b * b, k) - mu_b ** 2
        cov = _np_blur_valid(a * b, k) - mu_a * mu_b
        lum = (2 * mu_a * mu_b + c1) / (mu_a ** 2 + mu_b ** 2 + c1)
        cs = (2 * cov + c2) / (var_a + var_b + c2)
        term = cs.mean() if j < scales - 1 else (lum * cs).mean()
        score *= max(term, 0.0) ** w[j]
        if j < scales - 1:
            h, wd = a.shape[0] // 2 * 2, a.shape[1] // 2 * 2
            a = a[:h, :wd].reshape(h // 2, 2, wd // 2, 2, -1).mean((1, 3))
            b = b[:h, :wd].reshape(h // 2, 2, wd // 2, 2, -1).mean((1, 3))
    return score


# ------------------------------------------------------------------- tests

def test_identical_images_score_one():
    a = _images(4, 32)
    np.testing.assert_allclose(msssim(a, a.copy()), 1.0, atol=1e-5)


def test_matches_numpy_reference():
    a = _images(3, 64, c=3, seed=1)
    b = np.clip(a + 0.2 * _images(3, 64, c=3, seed=2), -1, 1)
    got = msssim(a, b)
    want = [_np_msssim_single(a[i], b[i], n_scales(64)) for i in range(3)]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_degradation_monotonic():
    a = _images(4, 64, seed=3)
    rng = np.random.RandomState(4)
    noise = rng.randn(*a.shape).astype(np.float32)
    light = msssim(a, np.clip(a + 0.05 * noise, -1, 1)).mean()
    heavy = msssim(a, np.clip(a + 0.5 * noise, -1, 1)).mean()
    assert 1.0 > light > heavy > 0.0, (light, heavy)


def test_scale_count_law():
    assert n_scales(1024) == 5
    assert n_scales(176) == 5
    assert n_scales(128) == 4  # 128 // 2**4 = 8 < 11
    assert n_scales(32) == 2
    assert n_scales(16) == 1


def test_small_image_guard():
    a = _images(2, 8)
    with pytest.raises(ValueError, match="11-tap"):
        msssim(a, a)


def test_pairwise_mode_collapse_signal():
    """A collapsed set (one image repeated) must score far above a diverse
    set's pairwise similarity."""
    diverse = _images(32, 32, seed=5)
    collapsed = np.repeat(_images(1, 32, seed=6), 32, axis=0)
    collapsed += 0.01 * np.random.RandomState(7).randn(
        *collapsed.shape).astype(np.float32)
    key = jax.random.PRNGKey(0)
    s_div = pairwise_msssim(diverse, key)
    s_col = pairwise_msssim(np.clip(collapsed, -1, 1), key)
    assert s_col > 0.9 > s_div, (s_col, s_div)


def test_pairwise_streaming_invariant():
    imgs = _images(24, 32, seed=8)
    key = jax.random.PRNGKey(1)
    np.testing.assert_allclose(pairwise_msssim(imgs, key, minibatch=12),
                               pairwise_msssim(imgs, key, minibatch=5),
                               rtol=1e-5)
