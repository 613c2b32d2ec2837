"""STFT / ISTFT / Griffin-Lim — numpy host versions and jitted on-device JAX
versions.

The reference delegates these to librosa on the CPU: spectrogram extraction
in the dataset (dataset.py:293-298) and a 100-iteration Griffin-Lim
reconstruction loop in the SoundSaver postprocessor
(output_postprocess.py:92-105) that costs two python-level FFT calls per
iteration. Here the signal processing is self-contained (no librosa), with
conventions matching librosa's defaults so datasets/postprocessors behave the
same: periodic Hann window, centered frames with reflect padding,
``1 + n_fft//2`` frequency bins.

The JAX Griffin-Lim runs the whole iteration loop on device under one jit
(``lax.fori_loop`` over rFFT -> phase -> irFFT -> overlap-add), which is the
"on-device STFT/Griffin-Lim pipeline" called for by the build's north star
(BASELINE.json). Framing is a gather; overlap-add is a scatter-add — both
XLA-native.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(n_fft: int) -> np.ndarray:
    """Periodic Hann (librosa/scipy ``fftbins=True`` convention)."""
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft)).astype(
        np.float32)


# ---------------------------------------------------------------------------
# numpy host versions (used by datasets during preload)
# ---------------------------------------------------------------------------

def stft_np(y: np.ndarray, n_fft: int = 2048, hop_length: int | None = None,
            center: bool = True) -> np.ndarray:
    """Short-time Fourier transform -> complex (1 + n_fft//2, n_frames)."""
    if hop_length is None:
        hop_length = n_fft // 4
    y = np.asarray(y, np.float32)
    if center:
        y = np.pad(y, n_fft // 2, mode="reflect")
    n_frames = 1 + (len(y) - n_fft) // hop_length
    if n_frames < 1:
        raise ValueError(f"signal too short for n_fft={n_fft}")
    strides = (y.strides[0] * hop_length, y.strides[0])
    frames = np.lib.stride_tricks.as_strided(
        y, shape=(n_frames, n_fft), strides=strides)
    spec = np.fft.rfft(frames * hann_window(n_fft)[None, :], axis=1)
    return spec.T.astype(np.complex64)


def istft_np(S: np.ndarray, hop_length: int | None = None,
             center: bool = True) -> np.ndarray:
    """Inverse STFT with windowed overlap-add and NOLA normalization."""
    n_fft = (S.shape[0] - 1) * 2
    if hop_length is None:
        hop_length = n_fft // 4
    win = hann_window(n_fft)
    frames = np.fft.irfft(S.T, n=n_fft, axis=1).astype(np.float32) * win[None, :]
    n_frames = frames.shape[0]
    length = n_fft + hop_length * (n_frames - 1)
    x = np.zeros(length, np.float32)
    wsum = np.zeros(length, np.float32)
    for t in range(n_frames):
        x[t * hop_length:t * hop_length + n_fft] += frames[t]
        wsum[t * hop_length:t * hop_length + n_fft] += win * win
    x = x / np.maximum(wsum, 1e-8)
    if center:
        x = x[n_fft // 2: length - n_fft // 2]
    return x


def griffin_lim_np(mag: np.ndarray, n_iter: int = 100,
                   hop_length: int | None = None,
                   seed: int = 0, verbose: bool = False) -> np.ndarray:
    """Host Griffin-Lim, mirroring the reference loop
    (output_postprocess.py:92-105): start from noise, iterate
    stft -> keep phase -> istft. ``verbose`` prints the per-iteration
    inter-iterate MSE like the reference (output_postprocess.py:99-104)."""
    n_fft = (mag.shape[0] - 1) * 2
    if hop_length is None:
        hop_length = n_fft // 4
    rng = np.random.RandomState(seed)
    x = rng.randn((mag.shape[1] - 1) * hop_length).astype(np.float32)
    for _ in range(n_iter):
        S = stft_np(x, n_fft, hop_length)
        S = S[:, :mag.shape[1]]
        phase = S / (np.abs(S) + 1e-8)
        pad = mag.shape[1] - S.shape[1]
        if pad > 0:
            phase = np.pad(phase, ((0, 0), (0, pad)), constant_values=1.0)
        prev_x = x
        x = istft_np(mag * phase, hop_length)
        if verbose:
            n = min(len(x), len(prev_x))
            mse = np.sqrt(np.square(x[:n] - prev_x[:n]).sum())
            print(f"MSE between sub- and ultimate iteration: {mse}")
    return x


# ---------------------------------------------------------------------------
# JAX on-device versions
# ---------------------------------------------------------------------------

def _frame_indices(sig_len: int, n_fft: int, hop_length: int) -> np.ndarray:
    n_frames = 1 + (sig_len - n_fft) // hop_length
    return (np.arange(n_frames)[:, None] * hop_length
            + np.arange(n_fft)[None, :])


def stft_jax(y: jax.Array, n_fft: int, hop_length: int,
             center: bool = True) -> jax.Array:
    """On-device STFT -> (1 + n_fft//2, n_frames) complex64. Static shapes."""
    if center:
        y = jnp.pad(y, n_fft // 2, mode="reflect")
    idx = _frame_indices(y.shape[0], n_fft, hop_length)
    frames = y[idx] * jnp.asarray(hann_window(n_fft))[None, :]
    return jnp.fft.rfft(frames, axis=1).T


def istft_jax(S: jax.Array, hop_length: int, center: bool = True,
              length: int | None = None) -> jax.Array:
    """On-device inverse STFT (scatter-add overlap-add + NOLA)."""
    n_fft = (S.shape[0] - 1) * 2
    win = jnp.asarray(hann_window(n_fft))
    frames = jnp.fft.irfft(S.T, n=n_fft, axis=1).real.astype(jnp.float32)
    frames = frames * win[None, :]
    n_frames = frames.shape[0]
    total = n_fft + hop_length * (n_frames - 1)
    idx = jnp.asarray(_frame_indices(total, n_fft, hop_length))
    x = jnp.zeros((total,), jnp.float32).at[idx].add(frames)
    wsum = jnp.zeros((total,), jnp.float32).at[idx].add(
        jnp.broadcast_to(win * win, frames.shape))
    x = x / jnp.maximum(wsum, 1e-8)
    if center:
        x = x[n_fft // 2: total - n_fft // 2]
    if length is not None:
        x = x[:length]
    return x


@partial(jax.jit,
         static_argnames=("n_fft", "hop_length", "img_mode", "range_in"))
def sound_images_jax(signals: jax.Array, n_fft: int, hop_length: int,
                     img_mode: str, range_in=(0, 255)) -> jax.Array:
    """Batched on-device spectrogram-image extraction: (F, L) float32
    signals -> (F, n_fft//2, n_fft//2) uint8 images, ONE XLA program for all
    files (vmapped STFT -> crop -> log transform -> per-file dynamic-range
    normalization). Device replacement for the reference's per-file librosa
    CPU path (dataset.py:293-299); semantics match ``stft_np`` +
    ``SoundImageDataset.load_file``'s host math.
    """
    if img_mode not in ("abslog", "reallog"):
        raise ValueError(f"unknown img_mode: {img_mode!r}")
    lo_out, hi_out = range_in

    def one(sig):
        S = stft_jax(sig, n_fft, hop_length)
        S = S[:n_fft // 2, :n_fft // 2]
        if img_mode == "abslog":
            img = jnp.log1p(jnp.abs(S))
        else:  # signed log of the real part (reference dataset.py:298)
            img = jnp.log1p(jnp.abs(S.real)) * jnp.sign(S.real)
        lo, hi = img.min(), img.max()
        scale = (hi_out - lo_out) / jnp.maximum(hi - lo, 1e-20)
        return (img - lo) * scale + lo_out

    imgs = jax.vmap(one)(signals.astype(jnp.float32))
    # host path applies np.uint8(...) — truncation, not rounding
    return jnp.clip(imgs, 0, 255).astype(jnp.uint8)


def sound_image_signal_length(n_fft: int, hop_length: int) -> int:
    """Samples needed so the cropped n_fft//2-frame window sees only real
    samples (no end-reflection bleed): frames 0..n_fft//2-1 of a centered
    STFT cover ``(n_fft//2 - 1) * hop + n_fft//2`` pre-padding samples."""
    return (n_fft // 2 - 1) * hop_length + n_fft // 2


@partial(jax.jit, static_argnames=("n_iter", "hop_length", "n_fft"))
def _griffin_lim_jitted(mag: jax.Array, x0: jax.Array, n_iter: int,
                        hop_length: int, n_fft: int) -> jax.Array:
    n_frames = mag.shape[1]

    def body(_, x):
        S = stft_jax(x, n_fft, hop_length)
        S = S[:, :n_frames]
        phase = S / (jnp.abs(S) + 1e-8)
        return istft_jax(mag * phase, hop_length, length=x0.shape[0])

    return jax.lax.fori_loop(0, n_iter, body, x0)


def griffin_lim_jax(mag, n_iter: int = 100, hop_length: int | None = None,
                    seed: int = 0) -> np.ndarray:
    """Device Griffin-Lim: the full phase-retrieval loop compiles to one XLA
    program (no per-iteration host round-trips)."""
    mag = jnp.asarray(mag, jnp.float32)
    n_fft = (mag.shape[0] - 1) * 2
    if hop_length is None:
        hop_length = n_fft // 4
    x0 = jax.random.normal(jax.random.PRNGKey(seed),
                           ((mag.shape[1] - 1) * hop_length,), jnp.float32)
    return np.asarray(_griffin_lim_jitted(mag, x0, n_iter, hop_length, n_fft))


@partial(jax.jit, static_argnames=("n_iter", "hop_length", "n_fft"))
def _griffin_lim_batch_jitted(mags, x0, n_iter, hop_length, n_fft):
    return jax.vmap(
        lambda m: _griffin_lim_jitted(m, x0, n_iter, hop_length, n_fft))(mags)


def griffin_lim_batch_jax(mags, n_iter: int = 100,
                          hop_length: int | None = None,
                          seed: int = 0) -> np.ndarray:
    """Batched device Griffin-Lim: ONE dispatch (and one compile per shape)
    for a whole (B, F, T) magnitude batch — the per-sample serial loop paid
    a device round-trip per sample. Each sample uses the same seeded init
    ``x0`` as the unbatched path, so results are bit-identical to calling
    ``griffin_lim_jax`` per sample."""
    mags = jnp.asarray(mags, jnp.float32)
    n_fft = (mags.shape[1] - 1) * 2
    if hop_length is None:
        hop_length = n_fft // 4
    x0 = jax.random.normal(jax.random.PRNGKey(seed),
                           ((mags.shape[2] - 1) * hop_length,), jnp.float32)
    return np.asarray(
        _griffin_lim_batch_jitted(mags, x0, n_iter, hop_length, n_fft))
