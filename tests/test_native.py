"""Native host-prep library: builds from source, matches the numpy reference
semantics bit-for-bit, and accelerates the loader's raw-batch path."""

import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def native():
    lib = os.path.join(REPO, "native", "build", "libpggan_host.so")
    if not os.path.exists(lib):
        subprocess.run(["make", "-C", os.path.join(REPO, "native")],
                       check=True, capture_output=True)
    from pggan_tpu.data import native as native_mod
    native_mod._tried = False
    native_mod._lib = None
    os.environ.pop("PGGAN_DISABLE_NATIVE", None)
    assert native_mod.available()
    return native_mod


def test_box_downsample_bit_identical(native):
    from pggan_tpu.data.datasets import box_downsample
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (64, 64, 3), dtype=np.uint8)
    for factor in (2, 4, 8):
        got = native.box_downsample_u8(img, factor)
        want = np.uint8(np.clip(np.round(box_downsample(img, factor)), 0, 255))
        np.testing.assert_array_equal(got, want)


def test_prep_batch_matches_numpy_fallback(native):
    from pggan_tpu.data.datasets import _alpha_fade_blend
    rng = np.random.RandomState(1)
    batch = rng.randint(0, 256, (4, 16, 16, 1), dtype=np.uint8)
    for alpha in (1.0, 0.5, 0.0):
        got = native.prep_batch_f32(batch, alpha)
        x = batch.astype(np.float32)
        if alpha < 1.0:
            x = np.stack([_alpha_fade_blend(v, alpha) for v in x])
        want = (x - 0) * (2.0 / 255.0) - 1.0
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_loader_raw_batch_path_matches_itemwise(native):
    from pggan_tpu.data import DataIterator, SyntheticDataset
    ds = SyntheticDataset(resolution=16, num_channels=3, num_items=8)
    ds.model_depth = 2
    ds.alpha = 0.4
    idxs = [0, 3, 5]
    raw = ds.raw_batch(idxs)
    assert raw is not None and raw.dtype == np.uint8
    fused = native.prep_batch_f32(raw, ds.alpha, ds.range_in, ds.range_out)
    itemwise = np.stack([ds[i] for i in idxs])
    np.testing.assert_allclose(fused, itemwise, atol=1e-4)
    it = DataIterator(ds, batch_size=4, num_workers=1, seed=0)
    b = next(it)
    assert b.shape == (4, 16, 16, 3) and b.dtype == np.float32
    it.close()


def test_native_disable_env(native):
    os.environ["PGGAN_DISABLE_NATIVE"] = "1"
    native._tried = False
    native._lib = None
    try:
        assert not native.available()
        batch = np.zeros((1, 4, 4, 1), np.uint8)
        out = native.prep_batch_f32(batch, 0.5)
        np.testing.assert_allclose(out, -1.0)
    finally:
        os.environ.pop("PGGAN_DISABLE_NATIVE", None)
        native._tried = False
        native._lib = None
