"""Shape/semantics tests for Generator and Discriminator per (depth, alpha)
(SURVEY.md §4 unit-test plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pggan_tpu.models import Discriminator, Generator

SHAPE_64 = (100, 3, 64, 64)  # reference dataset_shape convention (N, C, H, W)


@pytest.fixture(scope="module")
def g64():
    model = Generator(SHAPE_64, latent_size=32, fmap_base=128, fmap_max=64)
    return model, model.init(jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def d64():
    model = Discriminator(SHAPE_64, fmap_base=128, fmap_max=64)
    return model, model.init(jax.random.PRNGKey(1))


def test_max_depth_matches_reference(g64, d64):
    # R = log2(64) = 6; G.max_depth = len(blocks) = R-2 (network.py:116);
    # D.max_depth = len(blocks)-1 = R-2 (network.py:223).
    g, _ = g64
    d, _ = d64
    assert g.max_depth == 4
    assert d.max_depth == 4


@pytest.mark.parametrize("depth", [0, 1, 2, 3, 4])
def test_generator_output_shape(g64, depth):
    g, params = g64
    z = jax.random.normal(jax.random.PRNGKey(2), (5, g.latent_size))
    out = g.apply(params, z, depth, 1.0)
    res = 4 * 2 ** depth
    assert out.shape == (5, res, res, 3)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("depth", [0, 1, 2, 3, 4])
def test_discriminator_output_shape(d64, depth):
    d, params = d64
    res = 4 * 2 ** depth
    x = jax.random.normal(jax.random.PRNGKey(3), (5, res, res, 3))
    out = d.apply(params, x, depth, 1.0)
    assert out.shape == (5, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_generator_alpha_blend_endpoints(g64):
    """At alpha=1 the output is the new block's toRGB; at alpha=0 it is the
    prev-stage toRGB of the upsampled features (network.py:131-138)."""
    g, params = g64
    z = jax.random.normal(jax.random.PRNGKey(4), (2, g.latent_size))
    out0 = np.asarray(g.apply(params, z, 2, 0.0))
    out_half = np.asarray(g.apply(params, z, 2, 0.5))
    out1 = np.asarray(g.apply(params, z, 2, 1.0))
    np.testing.assert_allclose(out_half, 0.5 * out0 + 0.5 * out1,
                               rtol=1e-4, atol=1e-5)
    assert not np.allclose(out0, out1)


def test_generator_alpha0_is_upsampled_prev_depth(g64):
    """alpha=0 at depth d must equal the depth d-1 output nearest-upsampled
    (the fade-in contract; 1x1 toRGB commutes with nearest upsample is NOT
    assumed — the reference applies toRGB after the upsample and so do we, so
    equality is with toRGB-after-upsample)."""
    g, params = g64
    z = jax.random.normal(jax.random.PRNGKey(5), (2, g.latent_size))
    # depth-1 features path: replicate by hand
    out_fade = np.asarray(g.apply(params, z, 1, 0.0))
    # depth 0 features -> upsample -> block0.toRGB
    from pggan_tpu.ops import upsample_nearest_2x
    h = z.reshape(2, 1, 1, g.latent_size)
    from pggan_tpu.ops import pixelnorm
    h = pixelnorm(h)
    h = g._block(params["block0"], h, first=True)
    h = upsample_nearest_2x(h)
    want = np.asarray(g._torgb(params["block0"], h))
    np.testing.assert_allclose(out_fade, want, rtol=1e-4, atol=1e-5)


def test_discriminator_alpha_blend_changes_output(d64):
    d, params = d64
    x = jax.random.normal(jax.random.PRNGKey(6), (4, 16, 16, 3))
    s0 = np.asarray(d.apply(params, x, 2, 0.0))
    s1 = np.asarray(d.apply(params, x, 2, 1.0))
    s_half = np.asarray(d.apply(params, x, 2, 0.5))
    assert not np.allclose(s0, s1)
    assert np.isfinite(s_half).all()


def test_channel_counts_1024_config():
    # Paper config: 1024x1024, fmap_base 4096 -> nf(0..8) checks via param shapes
    g = Generator((1, 3, 1024, 1024))
    assert g.max_depth == 8
    assert g.nf(8) == 16
    d = Discriminator((1, 3, 1024, 1024))
    assert d.max_depth == 8


def test_generator_jit_per_depth(g64):
    g, params = g64
    z = jax.random.normal(jax.random.PRNGKey(7), (2, g.latent_size))
    f = jax.jit(g.apply, static_argnums=(2,))
    a = f(params, z, 1, jnp.float32(0.7))
    b = g.apply(params, z, 1, 0.7)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_grayscale_single_channel():
    shape = (10, 1, 16, 16)
    g = Generator(shape, latent_size=16, fmap_base=64, fmap_max=32)
    d = Discriminator(shape, fmap_base=64, fmap_max=32)
    gp, dp = g.init(jax.random.PRNGKey(0)), d.init(jax.random.PRNGKey(1))
    z = jax.random.normal(jax.random.PRNGKey(2), (3, 16))
    img = g.apply(gp, z, g.max_depth, 1.0)
    assert img.shape == (3, 16, 16, 1)
    score = d.apply(dp, img, d.max_depth, 1.0)
    assert score.shape == (3, 1)
