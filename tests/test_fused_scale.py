"""Fused scale-change convolutions: the fused_scale=True fast path must be
numerically equivalent to the reference-order unfused path at every depth and
alpha."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pggan_tpu.models import Discriminator, Generator
from pggan_tpu.ops.primitives import (
    avg_pool_2x,
    conv_init,
    equalized_conv2d,
    equalized_conv2d_pool_in,
    equalized_conv2d_up2x,
    upsample_nearest_2x,
)

SHAPE = (32, 3, 64, 64)


def test_up2x_fusion_matches_unfused_op():
    p = conv_init(jax.random.PRNGKey(0), 3, 8, 4, wscale=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 5, 8))
    ref = equalized_conv2d(p, upsample_nearest_2x(x), padding=1,
                           act="lrelu", use_pixelnorm=True)
    fused = equalized_conv2d_up2x(p, x, act="lrelu", use_pixelnorm=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pool_in_fusion_matches_unfused_op():
    p = conv_init(jax.random.PRNGKey(2), 1, 6, 3, wscale=True)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 10, 10, 6))
    ref = equalized_conv2d(p, avg_pool_2x(x), padding=0,
                           act="lrelu", use_pixelnorm=False)
    fused = equalized_conv2d_pool_in(p, x, act="lrelu", use_pixelnorm=False)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("depth,alpha", [(1, 0.3), (2, 0.0), (3, 0.7),
                                         (4, 1.0)])
def test_generator_fused_equals_unfused(depth, alpha):
    g_f = Generator(SHAPE, latent_size=16, fmap_base=128, fmap_max=64,
                    fused_scale=True)
    g_u = Generator(SHAPE, latent_size=16, fmap_base=128, fmap_max=64,
                    fused_scale=False)
    params = g_f.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (3, 16))
    out_f = np.asarray(g_f.apply(params, z, depth, alpha))
    out_u = np.asarray(g_u.apply(params, z, depth, alpha))
    np.testing.assert_allclose(out_f, out_u, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("depth,alpha", [(1, 0.3), (3, 0.5)])
def test_discriminator_fused_equals_unfused(depth, alpha):
    d_f = Discriminator(SHAPE, fmap_base=128, fmap_max=64, fused_scale=True)
    d_u = Discriminator(SHAPE, fmap_base=128, fmap_max=64, fused_scale=False)
    params = d_f.init(jax.random.PRNGKey(0))
    res = 4 * 2 ** depth
    x = jax.random.normal(jax.random.PRNGKey(1), (4, res, res, 3))
    np.testing.assert_allclose(np.asarray(d_f.apply(params, x, depth, alpha)),
                               np.asarray(d_u.apply(params, x, depth, alpha)),
                               rtol=1e-3, atol=1e-4)


def test_fused_gradients_match():
    """Param gradients through the fused path equal the unfused path."""
    g_f = Generator(SHAPE, latent_size=16, fmap_base=128, fmap_max=64,
                    fused_scale=True)
    g_u = Generator(SHAPE, latent_size=16, fmap_base=128, fmap_max=64,
                    fused_scale=False)
    params = g_f.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 16))

    def loss(g, p):
        return jnp.sum(jnp.square(g.apply(p, z, 2, 0.5)))

    gf = jax.grad(lambda p: loss(g_f, p))(params)
    gu = jax.grad(lambda p: loss(g_u, p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gu)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=1e-3)


@pytest.mark.parametrize("depth", [0, 1, 3])
def test_stable_graph_equals_fade_graph_at_alpha1(depth):
    """fade=False must equal fade=True at alpha==1 for G and D (the
    reference's preult_rgb=0 branch, network.py:136-137)."""
    g = Generator(SHAPE, latent_size=16, fmap_base=128, fmap_max=64)
    d = Discriminator(SHAPE, fmap_base=128, fmap_max=64)
    gp, dp = g.init(jax.random.PRNGKey(0)), d.init(jax.random.PRNGKey(1))
    z = jax.random.normal(jax.random.PRNGKey(2), (3, 16))
    a = np.asarray(g.apply(gp, z, depth, 1.0, fade=True))
    b = np.asarray(g.apply(gp, z, depth, 1.0, fade=False))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    x = jax.random.normal(jax.random.PRNGKey(3), (3, 4 * 2 ** depth,
                                                  4 * 2 ** depth, 3))
    sa = np.asarray(d.apply(dp, x, depth, 1.0, fade=True))
    sb = np.asarray(d.apply(dp, x, depth, 1.0, fade=False))
    np.testing.assert_allclose(sa, sb, rtol=1e-5, atol=1e-6)
