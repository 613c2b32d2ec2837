"""STFT/ISTFT/Griffin-Lim correctness (SURVEY.md §4: STFT shapes,
Griffin-Lim round-trip error decreasing)."""

import numpy as np
import pytest

from pggan_tpu.ops.stft import (
    griffin_lim_jax,
    griffin_lim_np,
    hann_window,
    istft_jax,
    istft_np,
    stft_jax,
    stft_np,
)


def chirp(n=8192, sr=8000):
    t = np.arange(n) / sr
    return np.sin(2 * np.pi * (200 + 300 * t) * t).astype(np.float32)


def test_stft_shape():
    x = chirp()
    S = stft_np(x, n_fft=256, hop_length=64)
    assert S.shape[0] == 129  # 1 + n_fft//2
    assert S.dtype == np.complex64


def test_istft_roundtrip():
    x = chirp()
    S = stft_np(x, 256, 64)
    y = istft_np(S, 64)
    n = min(len(x), len(y))
    # interior must match closely (edges lose window coverage)
    np.testing.assert_allclose(y[256:n - 256], x[256:n - 256],
                               atol=1e-3, rtol=1e-3)


def test_jax_matches_numpy_stft():
    x = chirp(4096)
    Sn = stft_np(x, 256, 64)
    Sj = np.asarray(stft_jax(x, 256, 64))
    np.testing.assert_allclose(Sj, Sn, atol=1e-3)


def test_jax_matches_numpy_istft():
    x = chirp(4096)
    S = stft_np(x, 256, 64)
    yn = istft_np(S, 64)
    yj = np.asarray(istft_jax(S, 64))
    n = min(len(yn), len(yj))
    np.testing.assert_allclose(yj[:n], yn[:n], atol=1e-3)


def test_window_is_periodic_hann():
    w = hann_window(8)
    assert w[0] == 0.0
    assert w.shape == (8,)
    np.testing.assert_allclose(w[4], 1.0, atol=1e-6)


@pytest.mark.parametrize("impl", [griffin_lim_np, griffin_lim_jax])
def test_griffin_lim_reduces_spectral_error(impl):
    """Reconstruction from |STFT| should approach the true magnitude as
    iterations increase."""
    x = chirp(4096)
    mag = np.abs(stft_np(x, 256, 64))

    def spectral_err(y):
        S = np.abs(stft_np(y.astype(np.float32), 256, 64))
        m = min(S.shape[1], mag.shape[1])
        return np.linalg.norm(S[:, :m] - mag[:, :m]) / np.linalg.norm(mag[:, :m])

    err_few = spectral_err(impl(mag, n_iter=2, hop_length=64))
    err_many = spectral_err(impl(mag, n_iter=40, hop_length=64))
    assert err_many < err_few
    assert err_many < 0.35


def test_griffin_lim_jax_matches_np_structure():
    x = chirp(2048)
    mag = np.abs(stft_np(x, 128, 32))
    y = griffin_lim_jax(mag, n_iter=5, hop_length=32)
    assert y.shape == ((mag.shape[1] - 1) * 32,)
    assert np.isfinite(y).all()


def test_griffin_lim_batch_matches_serial():
    """The batched inversion (one dispatch per tick, SoundSaver) must be
    bit-identical to per-sample griffin_lim_jax calls (same seeded init)."""
    from pggan_tpu.ops.stft import griffin_lim_batch_jax
    x = chirp(4096)
    mags = np.stack([np.abs(stft_np(x[i * 512:i * 512 + 2048], 128, 32))
                     for i in range(3)])
    batch = griffin_lim_batch_jax(mags, n_iter=5, hop_length=32)
    assert batch.shape == (3, (mags.shape[2] - 1) * 32)
    for i in range(3):
        one = griffin_lim_jax(mags[i], n_iter=5, hop_length=32)
        np.testing.assert_allclose(batch[i], one, rtol=1e-5, atol=1e-6)
