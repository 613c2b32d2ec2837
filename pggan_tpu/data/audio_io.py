"""Minimal WAV I/O with no external audio dependencies.

The reference chains librosa/soundfile imports with fallbacks
(dataset.py:16-28) and writes through ``librosa.output.write_wav``
(output_postprocess.py:136-141). Neither library is guaranteed here, so WAV
read/write is implemented on scipy.io.wavfile (always present with scipy),
normalizing to float32 mono like the reference's load path
(dataset.py:286-288).
"""

from __future__ import annotations

import numpy as np

try:
    from scipy.io import wavfile as _wavfile
except ImportError:  # pragma: no cover - scipy is expected in this image
    _wavfile = None


def read_wav(path: str, mono: bool = True) -> tuple[np.ndarray, int]:
    """Read a WAV file -> (float32 signal in [-1, 1], sample_rate)."""
    if _wavfile is None:
        raise ImportError("scipy is required for WAV reading")
    sr, data = _wavfile.read(path)
    if data.dtype == np.int16:
        sig = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        sig = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        sig = (data.astype(np.float32) - 128.0) / 128.0
    else:  # float32/float64 wavs
        sig = data.astype(np.float32)
    if mono and sig.ndim == 2:
        sig = sig.mean(axis=1)  # stereo -> mono (reference dataset.py:287-288)
    return sig, int(sr)


def write_wav(path: str, signal: np.ndarray, sample_rate: int,
              norm: bool = True) -> None:
    """Write float signal as 16-bit PCM; ``norm`` peak-normalizes first
    (librosa ``write_wav(..., norm=True)`` behaviour the reference relies on,
    output_postprocess.py:136-141)."""
    if _wavfile is None:
        raise ImportError("scipy is required for WAV writing")
    sig = np.asarray(signal, np.float32)
    if norm:
        peak = np.abs(sig).max()
        if peak > 0:
            sig = sig / peak
    pcm = np.clip(sig, -1.0, 1.0)
    _wavfile.write(path, int(sample_rate), (pcm * 32767.0).astype(np.int16))
