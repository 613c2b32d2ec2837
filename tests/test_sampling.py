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
    with pytest.raises(ValueError):  # 0 % mb == 0 must not sneak through
        _sample(G, params, 0, 4)


def test_stable_alpha_serves_fade_free_graph(tiny_g):
    """alpha == 1 must take the fade=False graph (no full-res prev-toRGB +
    blend work) with values identical to the fade graph; mid-fade alphas
    keep the blend."""
    G, params = tiny_g
    single = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    stable = sample_images(G, params, 2, 1.0, 4, mesh=single,
                           rng=np.random.RandomState(3))
    # params passed as a jit ARGUMENT (not closed over) so XLA compiles the
    # exact program sample_images runs — closure constants fold differently
    # and break bitwise equality
    want = np.asarray(jax.jit(
        lambda p, z: G.apply(p, z, 2, np.float32(1.0), fade=False))(
            params, _latents_like(G, 4, 3)))
    np.testing.assert_array_equal(stable, want)
    mid = sample_images(G, params, 2, 0.25, 4, mesh=single,
                        rng=np.random.RandomState(3))
    want_mid = np.asarray(jax.jit(
        lambda p, z: G.apply(p, z, 2, np.float32(0.25), fade=True))(
            params, _latents_like(G, 4, 3)))
    np.testing.assert_array_equal(mid, want_mid)


def _latents_like(G, n, seed):
    from pggan_tpu.utils.misc import random_latents
    return random_latents(n, G.latent_size, np.random.RandomState(seed))


def test_mesh_attached_for_pallas_tail():
    """The serving path must hand the mesh to the model (training/steps.py
    contract) so the Pallas tail runs under shard_map instead of being
    replicated by GSPMD — and must restore the attribute afterwards."""
    from unittest import mock

    from pggan_tpu.ops import spatial

    G = Generator((1, 3, 128, 128), latent_size=16, fmap_base=512,
                  fmap_max=32)
    params = G.init(jax.random.PRNGKey(0))
    assert G._pallas_tail_start(5) is not None
    assert G.mesh is None
    seen = []
    orig = spatial.shard_map_batch

    def spy(fn, mesh, batch_axis, *a, **k):
        seen.append((mesh, batch_axis))
        return orig(fn, mesh, batch_axis, *a, **k)

    with mock.patch.object(spatial, "shard_map_batch", side_effect=spy):
        out = sample_images(G, params, 5, 1.0, 8, minibatch=8,
                            rng=np.random.RandomState(0))
    assert out.shape == (8, 128, 128, 3)
    assert seen and seen[-1][0] is not None and seen[-1][0].size == \
        jax.device_count(), "Pallas tail did not receive the serving mesh"
    assert G.mesh is None and G.batch_axis == "data"  # restored
    # sharded serving values match the single-device reference
    single = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    ref = sample_images(G, params, 5, 1.0, 8, minibatch=8,
                        rng=np.random.RandomState(0), mesh=single)
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=1e-4)
