"""Data layer tests: pyramid math, depth datasets, loaders, audio dataset
(SURVEY.md §4)."""

import os

import numpy as np
import pytest

from pggan_tpu.data import (
    DataIterator,
    DefaultImageFolderDataset,
    H5Dataset,
    InfiniteRandomSampler,
    SoundImageDataset,
    SyntheticDataset,
)
from pggan_tpu.data.datasets import box_downsample
from pggan_tpu.utils.misc import adjust_dynamic_range


def test_box_downsample_equals_strided_phase_mean():
    """The reference downsamples by averaging scale^2 strided phases
    (dataset.py:244-251); block mean is the same operator."""
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (16, 16, 3)).astype(np.float32)
    factor = 4
    phases = sum(img[a::factor, b::factor] for a in range(factor)
                 for b in range(factor)) / factor ** 2
    np.testing.assert_allclose(box_downsample(img, factor), phases, rtol=1e-6)


def test_adjust_dynamic_range():
    x = np.array([0.0, 127.5, 255.0])
    y = adjust_dynamic_range(x, (0, 255), (-1, 1))
    np.testing.assert_allclose(y, [-1.0, 0.0, 1.0])
    assert adjust_dynamic_range(x, (0, 255), (0, 255)) is x


def test_synthetic_dataset_depths():
    ds = SyntheticDataset(resolution=32, num_channels=3, num_items=8)
    assert ds.shape == (8, 3, 32, 32)
    ds.model_depth = 0
    item = ds[0]
    assert item.shape == (4, 4, 3)  # depth 0 + offset 2 => 2**2
    assert item.min() >= -1.0 and item.max() <= 1.0
    ds.model_depth = 3
    assert ds[0].shape == (32, 32, 3)


def test_alpha_fade_blends_towards_downsampled():
    ds = SyntheticDataset(resolution=16, num_channels=1, num_items=4)
    ds.model_depth = 2
    ds.alpha = 1.0
    sharp = ds[1]
    ds.alpha = 0.0
    blurred = ds[1]
    # alpha=0 item equals 2x box-down-up of the sharp item
    t = box_downsample(sharp, 2).repeat(2, axis=0).repeat(2, axis=1)
    np.testing.assert_allclose(blurred, t, atol=1e-5)


def _write_pngs(tmpdir, n=6, size=32, channels=3):
    from PIL import Image
    rng = np.random.RandomState(1)
    for i in range(n):
        arr = rng.randint(0, 256, (size, size, channels), dtype=np.uint8)
        Image.fromarray(arr if channels == 3 else arr[..., 0]).save(
            os.path.join(tmpdir, f"img_{i:03}.png"))


def test_image_folder_dataset_preload(tmp_path):
    _write_pngs(str(tmp_path), n=5, size=32)
    ds = DefaultImageFolderDataset(str(tmp_path), preload=True,
                                   imread_mode="RGB")
    assert ds.max_dataset_depth == 5
    assert ds.shape == (5, 3, 32, 32)
    ds.model_depth = 1  # dataset depth 3 -> 8x8
    assert ds[0].shape == (8, 8, 3)
    ds.model_depth = 3
    assert ds[2].shape == (32, 32, 3)


def test_image_folder_dataset_lazy(tmp_path):
    _write_pngs(str(tmp_path), n=3, size=16)
    ds = DefaultImageFolderDataset(str(tmp_path), preload=False,
                                   imread_mode="L")
    assert ds.shape == (3, 1, 16, 16)
    ds.model_depth = 0
    item = ds[0]
    assert item.shape == (4, 4, 1)
    assert np.isfinite(item).all()


def test_image_folder_grayscale_mode(tmp_path):
    _write_pngs(str(tmp_path), n=2, size=16, channels=3)
    ds = DefaultImageFolderDataset(str(tmp_path), preload=True,
                                   imread_mode="L")
    assert ds.shape[1] == 1


def test_h5_dataset(tmp_path):
    import h5py
    path = str(tmp_path / "toy.h5")
    rng = np.random.RandomState(2)
    with h5py.File(path, "w") as f:
        for r in (4, 8, 16):
            f.create_dataset(f"data{r}x{r}",
                             data=rng.randint(0, 256, (10, 3, r, r),
                                              dtype=np.uint8))
    ds = H5Dataset(path)
    assert ds.shape == (10, 3, 16, 16)
    assert len(ds) == 10
    ds.model_depth = 0
    assert ds[0].shape == (4, 4, 3)
    ds.model_depth = 2
    assert ds[3].shape == (16, 16, 3)
    ds.close()


def _write_wavs(tmpdir, n=2, num_samples=20000, sr=16000):
    # sr matches SoundImageDataset's default frequency, so loading is a
    # no-op resample and every sample-count expectation below holds exactly
    from pggan_tpu.data.audio_io import write_wav
    rng = np.random.RandomState(3)
    for i in range(n):
        t = np.arange(num_samples) / sr
        sig = np.sin(2 * np.pi * (100 + 50 * i) * t) + 0.1 * rng.randn(num_samples)
        write_wav(os.path.join(tmpdir, f"s{i}.wav"), sig.astype(np.float32), sr)


def test_sound_dataset_raw(tmp_path):
    _write_wavs(str(tmp_path), n=2, num_samples=20000)
    ds = SoundImageDataset(str(tmp_path), img_mode="raw", preload=True)
    # 4**k <= 20000 -> k = 7 -> 128x128? log2(sqrt(20000)) ~ 7.1 -> 128
    assert ds.shape[-1] == 128
    ds.model_depth = 0
    assert ds[0].shape == (4, 4, 1)


def test_sound_dataset_abslog(tmp_path):
    _write_wavs(str(tmp_path), n=2, num_samples=6000)
    ds = SoundImageDataset(str(tmp_path), img_mode="abslog", n_fft=64,
                           hop_length=64, preload=True)
    # image is (n_fft/2, n_fft/2) = 32x32
    assert ds.shape == (2, 1, 32, 32)
    ds.model_depth = 3
    item = ds[0]
    assert item.shape == (32, 32, 1)
    assert item.min() >= -1.0 and item.max() <= 1.0


def test_sound_dataset_reallog(tmp_path):
    _write_wavs(str(tmp_path), n=1, num_samples=6000)
    ds = SoundImageDataset(str(tmp_path), img_mode="reallog", n_fft=64,
                           hop_length=64, preload=True)
    assert ds.shape == (1, 1, 32, 32)


@pytest.mark.parametrize("mode", ["abslog", "reallog"])
def test_sound_preload_device_matches_host(tmp_path, mode):
    """The batched on-device preload extraction must reproduce the per-file
    host STFT path (the parity reference) up to uint8 quantization: the host
    FFT runs in float64, so allow +-1 level on a small fraction of pixels."""
    _write_wavs(str(tmp_path), n=2, num_samples=6000)
    ds = SoundImageDataset(str(tmp_path), img_mode=mode, n_fft=64,
                           hop_length=16, preload=True)
    device = ds.data[ds.max_dataset_depth]
    host = np.stack([ds.load_file(i) for i in range(2)])
    diff = np.abs(device.astype(np.int16) - host.astype(np.int16))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.98


def test_sound_preload_short_file_falls_back_to_host(tmp_path):
    # 4032 samples: enough for the 64 centered frames of a square image
    # (so the host path still builds a valid pyramid) but short of the
    # 4096-sample no-end-reflection window the device path requires
    # (ops/stft.py sound_image_signal_length) -> preload must fall back
    # to the per-file host STFT. Genuinely-too-short files raise a clear
    # ValueError instead (next test).
    _write_wavs(str(tmp_path), n=1, num_samples=4032)
    ds = SoundImageDataset(str(tmp_path), img_mode="abslog", n_fft=128,
                           hop_length=64, preload=True)
    host = ds.load_file(0)
    np.testing.assert_array_equal(ds.data[ds.max_dataset_depth][0], host)


def test_sound_too_short_file_raises_clear_error(tmp_path):
    # genuinely too short even for the host path: the reference would crash
    # later with a cryptic non-square shape error in the pyramid downsample;
    # we fail early naming the file and the required sample count
    _write_wavs(str(tmp_path), n=1, num_samples=3000)
    with pytest.raises(ValueError, match="needs >= 4032 samples"):
        SoundImageDataset(str(tmp_path), img_mode="abslog", n_fft=128,
                          hop_length=64, preload=True)


def test_infinite_sampler_covers_all():
    s = InfiniteRandomSampler(10, seed=0)
    seen = {next(s) for _ in range(50)}
    assert seen == set(range(10))


def test_data_iterator_batches_and_close():
    ds = SyntheticDataset(resolution=16, num_items=12)
    ds.model_depth = 1
    it = DataIterator(ds, batch_size=4, num_workers=2, seed=0)
    b = next(it)
    assert b.shape == (4, 8, 8, 3)
    assert b.dtype == np.float32
    b2 = next(it)
    assert b2.shape == (4, 8, 8, 3)
    it.close()


def test_data_iterator_sharded():
    ds = SyntheticDataset(resolution=16, num_items=16)
    ds.model_depth = 1
    it0 = DataIterator(ds, batch_size=4, num_workers=1, seed=0,
                       shard_index=0, num_shards=4)
    assert set(it0._indices.tolist()) == {0, 4, 8, 12}
    it0.close()


def test_data_iterator_error_propagation():
    class Broken(SyntheticDataset):
        def raw_batch(self, items):
            return None  # force the itemwise path

        def __getitem__(self, i):
            raise RuntimeError("boom")

    ds = Broken(resolution=16, num_items=4)
    it = DataIterator(ds, batch_size=2, num_workers=1)
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_dataset_pickle_roundtrip(tmp_path):
    """--save_dataset / --load_dataset config cache (reference
    train.py:91-98): datasets must pickle and keep serving items."""
    import pickle
    ds = SyntheticDataset(resolution=16, num_items=6)
    ds.model_depth = 1
    path = tmp_path / "ds.pkl"
    with open(path, "wb") as f:
        pickle.dump(ds, f)
    with open(path, "rb") as f:
        ds2 = pickle.load(f)
    np.testing.assert_allclose(ds2[0], ds[0])
    assert ds2.shape == ds.shape


def test_h5_dataset_pickles(tmp_path):
    import h5py
    import pickle
    path = str(tmp_path / "t.h5")
    with h5py.File(path, "w") as f:
        for r in (4, 8):
            f.create_dataset(f"data{r}x{r}",
                             data=np.zeros((4, 1, r, r), dtype=np.uint8))
    ds = H5Dataset(path)
    ds2 = pickle.loads(pickle.dumps(ds))  # arrays are in RAM; no live handle
    assert ds2.shape == (4, 1, 8, 8)


def test_folder_dataset_create_unused_depths(tmp_path):
    """preload + create_unused_depths materializes levels below the model
    offset too (reference dataset.py:139)."""
    _write_pngs(str(tmp_path), n=2, size=16)
    ds = DefaultImageFolderDataset(str(tmp_path), preload=True,
                                   create_unused_depths=True,
                                   imread_mode="L")
    assert ds.data[0] is not None and ds.data[0].shape == (2, 1, 1, 1)
    ds2 = DefaultImageFolderDataset(str(tmp_path), preload=True,
                                    imread_mode="L")
    assert ds2.data[0] is None  # only offset..max levels materialized
    assert ds2.data[2] is not None


def test_h5_dataset_max_images(tmp_path):
    import h5py
    path = str(tmp_path / "m.h5")
    with h5py.File(path, "w") as f:
        for r in (4, 8):
            f.create_dataset(f"data{r}x{r}",
                             data=np.zeros((10, 1, r, r), dtype=np.uint8))
    ds = H5Dataset(path, max_images=4)
    assert len(ds) == 4
    assert ds.shape == (4, 1, 8, 8)


def test_read_wav_resamples_to_target_rate(tmp_path):
    """read_wav(target_rate=...) must polyphase-resample: rate returned,
    length scaled, and a band-limited tone preserved (VERDICT r3 missing #1:
    the reference's librosa path resamples to ``frequency``,
    dataset.py:19,286; its soundfile shadow silently didn't)."""
    from pggan_tpu.data.audio_io import read_wav, write_wav
    sr_in, sr_out, secs = 44100, 16000, 1.0
    t = np.arange(int(sr_in * secs)) / sr_in
    tone = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    path = str(tmp_path / "tone.wav")
    write_wav(path, tone.astype(np.float32), sr_in, norm=False)

    sig, sr = read_wav(path, target_rate=sr_out)
    assert sr == sr_out
    assert abs(sig.shape[0] - int(sr_out * secs)) <= 1
    # the 440 Hz tone must survive: compare against its ideal 16 kHz twin
    t2 = np.arange(sig.shape[0]) / sr_out
    want = 0.5 * np.sin(2 * np.pi * 440.0 * t2)
    core = slice(100, -100)  # polyphase edges ring; judge the interior
    assert np.abs(sig[core] - want[core]).max() < 2e-3

    native, sr_n = read_wav(path)  # no target: native rate, untouched
    assert sr_n == sr_in and native.shape[0] == int(sr_in * secs)


def test_sound_dataset_honors_frequency(tmp_path):
    """A 44.1 kHz corpus with frequency=16000 must produce (near-)identical
    spectrogram images to its pre-resampled 16 kHz twin corpus (VERDICT r3
    'done' criterion). Both dirs hold the same underlying audio."""
    from scipy.io import wavfile

    from pggan_tpu.data.audio_io import resample
    sr_hi, sr_lo = 44100, 16000
    rng = np.random.RandomState(11)
    d_hi = tmp_path / "hi"
    d_lo = tmp_path / "lo"
    os.makedirs(d_hi), os.makedirs(d_lo)
    n_lo = 6000
    n_hi = int(n_lo * sr_hi / sr_lo)
    for i in range(2):
        t = np.arange(n_hi) / sr_hi
        sig = np.sin(2 * np.pi * (150 + 80 * i) * t) \
            + 0.05 * rng.randn(n_hi)
        sig = sig.astype(np.float32)
        # float32 WAVs: no PCM quantization between the two pipelines, so
        # the only difference is where the one resample happens
        wavfile.write(str(d_hi / f"s{i}.wav"), sr_hi, sig)
        wavfile.write(str(d_lo / f"s{i}.wav"), sr_lo,
                      resample(sig, sr_hi, sr_lo))

    kw = dict(img_mode="abslog", n_fft=64, hop_length=16, preload=True,
              frequency=sr_lo)
    ds_hi = SoundImageDataset(str(d_hi), **kw)
    ds_lo = SoundImageDataset(str(d_lo), **kw)
    a = ds_hi.data[ds_hi.max_dataset_depth].astype(np.int16)
    b = ds_lo.data[ds_lo.max_dataset_depth].astype(np.int16)
    # identical up to 16-bit PCM quantization of the lo fixture + uint8
    # image quantization: allow a few levels on a small fraction of pixels
    diff = np.abs(a - b)
    assert diff.max() <= 3, diff.max()
    assert (diff <= 1).mean() > 0.99


def test_sound_dataset_native_rate_when_frequency_none(tmp_path):
    _write_wavs(str(tmp_path), n=1, num_samples=6000, sr=8000)
    ds = SoundImageDataset(str(tmp_path), img_mode="abslog", n_fft=64,
                           hop_length=64, preload=True, frequency=0)
    assert ds.shape == (1, 1, 32, 32)  # 6000 samples untouched


# ---------------------------------------------------------------------------
# streaming modes for >RAM corpora (VERDICT r3 #3): H5 windowed reads and the
# FolderDataset on-disk memmap pyramid must serve byte-identical items to the
# load-everything-into-RAM paths they replace.

def _toy_h5(path, n=10, seed=2):
    import h5py
    rng = np.random.RandomState(seed)
    with h5py.File(path, "w") as f:
        for r in (4, 8, 16):
            f.create_dataset(f"data{r}x{r}",
                             data=rng.randint(0, 256, (n, 3, r, r),
                                              dtype=np.uint8))


def test_h5_windowed_matches_preload(tmp_path):
    path = str(tmp_path / "toy.h5")
    _toy_h5(path)
    ram = H5Dataset(path, preload=True)
    win = H5Dataset(path, preload=False)
    assert win.shape == ram.shape and len(win) == len(ram)
    for depth in (0, 2):
        ram.model_depth = win.model_depth = depth
        for i in (0, 3, 9):
            np.testing.assert_array_equal(win[i], ram[i])
        # raw_batch with unsorted, duplicated indices (the sampler's shape)
        idxs = [7, 2, 2, 9, 0]
        np.testing.assert_array_equal(win.raw_batch(idxs),
                                      ram.raw_batch(idxs))
    win.close()
    ram.close()


def test_h5_windowed_pickles(tmp_path):
    """--save_dataset pkl caching must survive the open file handle."""
    import pickle
    path = str(tmp_path / "toy.h5")
    _toy_h5(path)
    ds = H5Dataset(path, preload=False, max_images=8)
    ds.model_depth = 1
    want = ds[2]
    clone = pickle.loads(pickle.dumps(ds))
    clone.model_depth = 1
    np.testing.assert_array_equal(clone[2], want)
    assert len(clone) == 8
    clone.close()
    ds.close()


def test_folder_disk_pyramid_matches_ram(tmp_path):
    data_dir = str(tmp_path / "imgs")
    os.makedirs(data_dir)
    _write_pngs(data_dir, n=5, size=32)
    ram = DefaultImageFolderDataset(data_dir, preload=True, imread_mode="RGB")
    disk = DefaultImageFolderDataset(data_dir, preload="disk",
                                     imread_mode="RGB",
                                     cache_dir=str(tmp_path / "cache"))
    assert disk.shape == ram.shape
    for depth in (0, 1, 3):
        ram.model_depth = disk.model_depth = depth
        for i in range(5):
            np.testing.assert_array_equal(disk[i], ram[i])
        idxs = [4, 1, 1, 0]
        np.testing.assert_array_equal(disk.raw_batch(idxs),
                                      ram.raw_batch(idxs))
    # fade path reads through the memmap too
    disk.model_depth = ram.model_depth = 2
    disk.alpha = ram.alpha = 0.5
    np.testing.assert_allclose(disk[3], ram[3], atol=1e-6)
    # every level is a read-only on-disk memmap, not an in-RAM copy
    lv = disk.data[disk.max_dataset_depth]
    assert isinstance(lv, np.memmap) and not lv.flags.writeable
    assert os.path.exists(os.path.join(str(tmp_path / "cache"), "meta.json"))


def test_folder_disk_pyramid_cache_reuse_and_invalidation(tmp_path,
                                                          monkeypatch):
    data_dir = str(tmp_path / "imgs")
    os.makedirs(data_dir)
    _write_pngs(data_dir, n=4, size=16)
    cache = str(tmp_path / "cache")
    kw = dict(preload="disk", imread_mode="L", cache_dir=cache,
              max_dataset_depth=4)
    first = DefaultImageFolderDataset(data_dir, **kw)
    first.model_depth = 2
    want = first[1]

    calls = {"n": 0}
    orig = DefaultImageFolderDataset.load_file

    def counting(self, item):
        calls["n"] += 1
        return orig(self, item)

    monkeypatch.setattr(DefaultImageFolderDataset, "load_file", counting)
    reopened = DefaultImageFolderDataset(data_dir, **kw)
    assert calls["n"] == 0  # valid cache: zero decodes on reopen
    reopened.model_depth = 2
    np.testing.assert_array_equal(reopened[1], want)

    # corpus change (different file size) must invalidate and rebuild
    from PIL import Image
    big = np.random.RandomState(9).randint(0, 256, (16, 16), dtype=np.uint8)
    Image.fromarray(big, "L").save(os.path.join(data_dir, "img_000.png"),
                                   compress_level=0)
    rebuilt = DefaultImageFolderDataset(data_dir, **kw)
    assert calls["n"] > 0
    rebuilt.model_depth = 2
    np.testing.assert_array_equal(np.asarray(rebuilt.data[4][0]),
                                  orig(rebuilt, 0))


def test_folder_disk_pyramid_feeds_loader(tmp_path):
    """The pod-default input path (uint8 raw batches -> device prep) over the
    disk pyramid: batches stream from the memmaps."""
    data_dir = str(tmp_path / "imgs")
    os.makedirs(data_dir)
    _write_pngs(data_dir, n=6, size=32)
    ds = DefaultImageFolderDataset(data_dir, preload="disk",
                                   imread_mode="RGB",
                                   cache_dir=str(tmp_path / "cache"))
    ds.model_depth = 3
    it = DataIterator(ds, batch_size=4, num_workers=2, seed=0, raw=True)
    batch = next(it)
    assert batch.shape == (4, 32, 32, 3) and batch.dtype == np.uint8
    it.close()


def test_sound_disk_pyramid_matches_host_path(tmp_path):
    data_dir = str(tmp_path / "wavs")
    os.makedirs(data_dir)
    _write_wavs(data_dir, n=2, num_samples=6000)
    ds = SoundImageDataset(data_dir, img_mode="abslog", n_fft=64,
                           hop_length=16, preload="disk",
                           cache_dir=str(tmp_path / "cache"))
    for i in range(2):
        np.testing.assert_array_equal(
            np.asarray(ds.data[ds.max_dataset_depth][i]), ds.load_file(i))


# ---------------------------------------------------------------------------
# round-4 review fixes: pre-streaming pickle compat, windowed max_images
# bounds, and the disk-pyramid build lock.

def test_h5_setstate_accepts_pre_streaming_pickles(tmp_path):
    """pkl caches written by the pre-streaming H5Dataset carry no
    preload/max_images/_h5 keys; __setstate__ must default them instead of
    crashing on the first attribute read."""
    path = str(tmp_path / "toy.h5")
    _toy_h5(path)
    ds = H5Dataset(path, preload=True)
    ds.model_depth = 1
    state = ds.__getstate__()
    for k in ("preload", "max_images", "_h5"):
        state.pop(k, None)
    clone = H5Dataset.__new__(H5Dataset)
    clone.__setstate__(state)
    assert clone.preload is True and clone.max_images is None
    clone.model_depth = 1
    np.testing.assert_array_equal(clone[2], ds[2])


def test_h5_windowed_respects_max_images_bounds(tmp_path):
    """The windowed view must enforce the max_images cap exactly like the
    preload path: IndexError past the cap, negatives resolved against the
    CAPPED length (class docstring: 'Both modes serve identical items')."""
    path = str(tmp_path / "toy.h5")
    _toy_h5(path)
    ram = H5Dataset(path, preload=True, max_images=4)
    win = H5Dataset(path, preload=False, max_images=4)
    ram.model_depth = win.model_depth = 2
    np.testing.assert_array_equal(win[-1], ram[-1])
    np.testing.assert_array_equal(win[3], ram[3])
    with pytest.raises(IndexError):
        win[4]
    with pytest.raises(IndexError):
        win[-5]
    with pytest.raises(IndexError):
        win.raw_batch([1, 4])
    win.close()
    ram.close()


def _disk_pyramid_worker(data_dir, cache_dir, out_q):
    """Module-level so multiprocessing can spawn it (datasets.py is
    jax-free; the child never initializes XLA)."""
    try:
        ds = DefaultImageFolderDataset(data_dir, preload="disk",
                                       imread_mode="L",
                                       cache_dir=cache_dir)
        ds.model_depth = (ds.max_dataset_depth
                          - ds.model_dataset_depth_offset)
        out_q.put(("ok", np.asarray(ds[0])))
    except Exception as e:  # pragma: no cover - failure reporting
        out_q.put(("err", repr(e)))


def test_folder_disk_pyramid_concurrent_build(tmp_path):
    """Two processes hitting a COLD shared cache dir (every host of a
    multi-host run constructs the dataset): the O_EXCL build lock must make
    one build while the other waits, and both must serve correct items."""
    import multiprocessing as mp
    data_dir = str(tmp_path / "imgs")
    os.makedirs(data_dir)
    _write_pngs(data_dir, n=5, size=32, channels=1)
    cache_dir = str(tmp_path / "cache")

    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [ctx.Process(target=_disk_pyramid_worker,
                         args=(data_dir, cache_dir, q)) for _ in range(2)]
    for p in procs:
        p.start()
    outs = [q.get(timeout=120) for _ in procs]
    for p in procs:
        p.join(timeout=120)
    assert all(tag == "ok" for tag, _ in outs), outs

    ram = DefaultImageFolderDataset(data_dir, preload=True, imread_mode="L")
    ram.model_depth = ram.max_dataset_depth - ram.model_dataset_depth_offset
    want = np.asarray(ram[0])
    for _, got in outs:
        np.testing.assert_array_equal(got, want)
    # the finished cache carries no leftover lock
    assert not os.path.exists(os.path.join(cache_dir, ".build_lock"))


def test_folder_disk_pyramid_takes_over_dead_builder(tmp_path):
    """A stale lock with no meta (builder crashed mid-build) must not
    deadlock: the waiter takes over the build when the lock disappears, and
    a fresh constructor with no lock present rebuilds from scratch."""
    data_dir = str(tmp_path / "imgs")
    os.makedirs(data_dir)
    _write_pngs(data_dir, n=3, size=16, channels=1)
    cache_dir = str(tmp_path / "cache")
    os.makedirs(cache_dir)
    lock = os.path.join(cache_dir, ".build_lock")
    open(lock, "w").close()

    import threading
    timer = threading.Timer(1.0, os.unlink, args=(lock,))
    timer.start()
    try:
        ds = DefaultImageFolderDataset(data_dir, preload="disk",
                                       imread_mode="L",
                                       cache_dir=cache_dir)
    finally:
        timer.cancel()
    ds.model_depth = ds.max_dataset_depth - ds.model_dataset_depth_offset
    assert ds[0].shape == (16, 16, 1)


def test_sound_disk_pyramid_build_uses_device_stft(tmp_path, monkeypatch):
    """The streaming ``preload="disk"`` cache build must batch through the
    same on-device STFT program as the RAM preload (VERDICT r4 weak #7):
    the cached top level is byte-identical to the RAM preload's
    device-extracted level, and the per-file host STFT loop is never entered
    during the build (load_file runs exactly once, for the constructor's
    shape probe)."""
    wav_dir = str(tmp_path / "wavs")
    os.makedirs(wav_dir)
    _write_wavs(wav_dir, n=3, num_samples=6000)
    ram = SoundImageDataset(wav_dir, img_mode="abslog", n_fft=64,
                            hop_length=16, preload=True)

    calls = []
    orig = SoundImageDataset.load_file

    def counting_load_file(self, item):
        calls.append(item)
        return orig(self, item)

    monkeypatch.setattr(SoundImageDataset, "load_file", counting_load_file)
    disk = SoundImageDataset(wav_dir, img_mode="abslog", n_fft=64,
                             hop_length=16, preload="disk",
                             cache_dir=str(tmp_path / "cache"))
    assert calls == [0], ("disk build fell back to the per-file host "
                          f"loader: load_file called for items {calls}")
    np.testing.assert_array_equal(
        np.asarray(disk.data[disk.max_dataset_depth]),
        np.asarray(ram.data[ram.max_dataset_depth]))
    # derived levels byte-match too (built chunk-wise from the memmap)
    np.testing.assert_array_equal(
        np.asarray(disk.data[disk.min_dataset_depth]),
        np.asarray(ram.data[ram.min_dataset_depth]))
