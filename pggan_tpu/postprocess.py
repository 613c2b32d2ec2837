"""Sample postprocessors (reference output_postprocess.py): turn generated
NCHW numpy arrays into artifacts — PNG grids and Griffin-Lim WAVs.

Postprocessors accept NCHW float arrays in the model's output range, exactly
like the reference's contract (plugins.py:188-193 feeds
``generate_samples``'s NCHW numpy), so they are drop-in: the NHWC->NCHW
transpose happens at the sampling boundary (plugins.OutputGenerator).

The SoundSaver's phase retrieval runs the JAX Griffin-Lim (one fused XLA
program for the whole iteration loop — on TPU when available) instead of the
reference's 100 python-level librosa stft/istft round trips
(output_postprocess.py:92-105).
"""

from __future__ import annotations

import os

import numpy as np

from pggan_tpu.utils.misc import adjust_dynamic_range, numpy_upsample_nearest


class Postprocessor:
    def __init__(self, samples_path="."):
        self.samples_path = samples_path


class ImageSaver(Postprocessor):
    """Tile samples into a square grid and save a PNG
    (reference output_postprocess.py:21-71)."""

    output_file_format = "fakes_{}.png"

    def __init__(self, samples_path=".", drange=(-1, 1), resolution=512,
                 create_subdirs=True):
        super().__init__(samples_path)
        if create_subdirs:
            os.makedirs(self.samples_path, exist_ok=True)
        self.resolution = resolution
        self.drange = tuple(drange)

    def create_image_grid(self, images: np.ndarray) -> np.ndarray:
        """Row-major square-ish tiling, vectorized: pad the batch to a full
        rows x cols rectangle of zero tiles, then a single reshape/transpose
        assembles the mosaic (no per-image copy loop)."""
        count, channels, img_h, img_w = images.shape
        cols = max(int(np.ceil(np.sqrt(count))), 1)
        rows = -(-count // cols)
        missing = rows * cols - count
        if missing:
            images = np.concatenate(
                [images, np.zeros((missing,) + images.shape[1:],
                                  images.dtype)])
        tiles = images.reshape(rows, cols, channels, img_h, img_w)
        return tiles.transpose(2, 0, 3, 1, 4).reshape(
            channels, rows * img_h, cols * img_w)

    def convert_to_pil_image(self, image: np.ndarray):
        import PIL.Image
        arr = np.asarray(image)
        if arr.ndim == 3:  # (C, H, W): single channel -> 2-D, else HWC
            arr = arr[0] if arr.shape[0] == 1 else np.moveaxis(arr, 0, -1)
        arr = adjust_dynamic_range(arr, self.drange, (0, 255))
        arr = np.clip(np.rint(arr), 0, 255).astype(np.uint8)
        return PIL.Image.fromarray(arr, "L" if arr.ndim == 2 else "RGB")

    def __call__(self, output: np.ndarray, description):
        # Upsample small outputs to the display resolution; once generated
        # images reach (or exceed) it, save at native size — the reference
        # crashed here past its 512px target (output_postprocess.py:64-65,
        # utils.py:41), which would kill a 1024px run at its final stage.
        if self.resolution is not None and self.resolution > output.shape[-1] \
                and self.resolution % output.shape[-1] == 0:
            output = numpy_upsample_nearest(output, 2, size=self.resolution)
        im = self.convert_to_pil_image(self.create_image_grid(output))
        desc = (f"{description:06}" if isinstance(description, int)
                else str(description))
        im.save(os.path.join(self.samples_path,
                             self.output_file_format.format(desc)))


class SoundSaver(Postprocessor):
    """Spectrogram/raw image -> WAV (reference output_postprocess.py:74-153).

    - ``abslog``: invert magnitude via Griffin-Lim (device-jitted loop).
    - ``reallog``: invert the signed-log real-part STFT directly.
    - ``raw``: flatten pixels into the waveform.
    Frequency bins are padded to 2**i + 1 (real spectrograms have
    2**i + 1 bins, output_postprocess.py:109-111), the signal is
    peak-normalized, nearest-upsampled to compensate for reduced resolution,
    and written per-sample as ``fakes_sound_{kimg}_{i}.wav``. Errors are
    trapped to ``error_*.txt`` like the reference (output_postprocess.py:142-144).
    """

    output_file_format = "fakes_sound_{}_{}.wav"

    def __init__(self, samples_path=".", drange=(-1, 1), resolution=512,
                 mode="abslog", sample_rate=16000, hop_length=128,
                 create_subdirs=True, verbose=False, griffin_lim_iter=100,
                 use_device=True):
        super().__init__(samples_path)
        if create_subdirs:
            os.makedirs(self.samples_path, exist_ok=True)
        self.drange = tuple(drange)
        self.mode = mode
        self.sample_rate = sample_rate
        self.hop_length = hop_length
        self.verbose = verbose
        self.resolution = resolution
        self.griffin_lim_iter = griffin_lim_iter
        self.use_device = use_device

    def reconstruct_from_magnitude(self, stft_mag: np.ndarray) -> np.ndarray:
        if self.use_device:
            from pggan_tpu.ops.stft import griffin_lim_jax
            return griffin_lim_jax(stft_mag, self.griffin_lim_iter,
                                   self.hop_length)
        from pggan_tpu.ops.stft import griffin_lim_np
        return griffin_lim_np(stft_mag, self.griffin_lim_iter,
                              self.hop_length, verbose=self.verbose)

    def _pad_top_bin(self, image: np.ndarray) -> np.ndarray:
        """Real spectrograms have 2**i + 1 frequency bins; the square model
        output dropped the top one — restore it as zeros (reference
        output_postprocess.py:109-111)."""
        return np.pad(np.asarray(image, np.float32), ((0, 1), (0, 0)))

    def _signal_reallog(self, image: np.ndarray) -> np.ndarray:
        # invert the signed-log real-part encoding: sgn(x) * (e^|x| - 1)
        from pggan_tpu.ops.stft import istft_np
        signed = adjust_dynamic_range(self._pad_top_bin(image),
                                      self.drange, (-1, 1))
        real_part = np.sign(signed) * np.expm1(np.abs(signed))
        return istft_np(real_part.astype(np.complex64), self.hop_length)

    def _signal_abslog(self, image: np.ndarray) -> np.ndarray:
        mag = adjust_dynamic_range(self._pad_top_bin(image),
                                   self.drange, (0, 255))
        return self.reconstruct_from_magnitude(mag)

    def image_to_sound(self, image: np.ndarray) -> np.ndarray:
        modes = {
            "reallog": self._signal_reallog,
            "abslog": self._signal_abslog,
            "raw": lambda im: np.asarray(im, np.float32).ravel(),
        }
        if self.mode not in modes:
            raise ValueError(
                f"unrecognized mode: {self.mode}. "
                "Available modes are: reallog, abslog, raw.")
        signal = np.asarray(modes[self.mode](image))
        peak = np.abs(signal).max()
        return signal / peak if peak > 0 else signal

    def output_wav(self, signal: np.ndarray, samples_description, ith: int):
        from pggan_tpu.data.audio_io import write_wav
        desc = (f"{samples_description:06}"
                if isinstance(samples_description, int)
                else str(samples_description))
        path = os.path.join(self.samples_path,
                            self.output_file_format.format(desc, f"{ith:02}"))
        try:
            write_wav(path, signal, self.sample_rate, norm=True)
        except Exception as e:
            err = os.path.join(self.samples_path,
                               f"error_{samples_description}_{ith}.txt")
            with open(err, "w") as f:
                f.write(f"Exception trying to save sound: {e}")

    def _signals_batch(self, images) -> list:
        """Per-sample signals for a whole tick's samples. In ``abslog`` mode
        on device, the Griffin-Lim inversions of ALL samples run as one
        batched dispatch (``griffin_lim_batch_jax``) instead of a device
        round-trip per sample; results are identical to the serial path."""
        if self.mode == "abslog" and self.use_device and len(images) > 1:
            from pggan_tpu.ops.stft import griffin_lim_batch_jax
            mags = np.stack([
                adjust_dynamic_range(self._pad_top_bin(im), self.drange,
                                     (0, 255)) for im in images])
            sigs = griffin_lim_batch_jax(mags, self.griffin_lim_iter,
                                         self.hop_length)
            out = []
            for s in sigs:
                peak = np.abs(s).max()
                out.append(s / peak if peak > 0 else s)
            return out
        return [self.image_to_sound(im) for im in images]

    def __call__(self, output: np.ndarray, samples_description):
        times_smaller = max(self.resolution // output.shape[-1], 1)
        if self.mode == "raw":
            times_smaller *= times_smaller
        signals = self._signals_batch([img[0] for img in output])
        for i, signal in enumerate(signals):
            signal = numpy_upsample_nearest(signal, 1,
                                            scale_factor=times_smaller)
            self.output_wav(signal, samples_description, i)
