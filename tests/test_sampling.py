"""Serving-path sampling helper (pggan_tpu/sampling.py): chunking pads the
last partial minibatch instead of dropping it (the reference's generate.py
samples one unchunked forward; eval previously floor-divided), and the batch
axis shards over the data-parallel mesh with results identical to one
device (the generator has no cross-batch ops)."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from pggan_tpu.models import Generator
from pggan_tpu.sampling import sample_images


@pytest.fixture(scope="module")
def tiny_g():
    G = Generator((1, 3, 32, 32), latent_size=16, fmap_base=64, fmap_max=32)
    params = G.init(jax.random.PRNGKey(0))
    return G, params


def _sample(G, params, num, mb, mesh=None, seed=7):
    rng = np.random.RandomState(seed)
    return sample_images(G, params, 2, 1.0, num,
                         minibatch=mb, rng=rng, mesh=mesh)


def test_chunked_equals_oneshot_including_remainder(tiny_g):
    G, params = tiny_g
    one = _sample(G, params, 10, 0)
    chunked = _sample(G, params, 10, 4)  # 4 + 4 + padded 2
    assert one.shape == (10, 16, 16, 3)  # depth 2 -> 16px
    # different padded batch shapes compile different fusions: identical
    # up to float reassociation, not bitwise
    np.testing.assert_allclose(one, chunked, rtol=2e-3, atol=1e-4)


def test_sharded_equals_single_device(tiny_g):
    G, params = tiny_g
    assert jax.device_count() >= 8  # conftest's virtual CPU mesh
    single = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    ref = _sample(G, params, 16, 8, mesh=single)
    shd = _sample(G, params, 16, 8)  # auto 8-device mesh
    np.testing.assert_allclose(ref, shd, rtol=2e-3, atol=1e-4)


def test_fewer_samples_than_devices(tiny_g):
    G, params = tiny_g
    out = _sample(G, params, 3, 0)  # pads 3 -> 8 on the device mesh
    single = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    ref = _sample(G, params, 3, 0, mesh=single)
    assert out.shape == (3, 16, 16, 3)
    np.testing.assert_allclose(ref, out, rtol=2e-3, atol=1e-4)


def test_rng_stream_invariant_to_chunking(tiny_g):
    """Padding draws NO extra latents, so any minibatch gives the same
    images for the same seed — a user can change --minibatch for memory
    without changing the samples."""
    G, params = tiny_g
    a = _sample(G, params, 9, 2)
    b = _sample(G, params, 9, 5)
    np.testing.assert_array_equal(a, b)


def test_rejects_nonpositive_chunk(tiny_g):
    G, params = tiny_g
    with pytest.raises(ValueError):
        _sample(G, params, 0, 0)
