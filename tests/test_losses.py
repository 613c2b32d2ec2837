"""WGAN-GP loss tests: hand-computed tiny cases and grad-of-grad sanity
(SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pggan_tpu.losses import calc_gradient_penalty, wgan_gp_D_loss, wgan_gp_G_loss
from pggan_tpu.models import Discriminator, Generator

SHAPE = (10, 1, 16, 16)


@pytest.fixture(scope="module")
def models():
    g = Generator(SHAPE, latent_size=16, fmap_base=64, fmap_max=32)
    d = Discriminator(SHAPE, fmap_base=64, fmap_max=32)
    return (g, g.init(jax.random.PRNGKey(0))), (d, d.init(jax.random.PRNGKey(1)))


def test_gradient_penalty_linear_critic():
    """For D(x) = <w, x>, grad_x D = w everywhere, so the penalty is the
    constant (||w|| - target)^2 * lambda / target^2 per sample
    (reference wgan_gp_loss.py:31)."""
    w = np.random.RandomState(0).randn(4, 4).astype(np.float32)

    def d_apply(params, x):
        return jnp.sum(x.reshape(x.shape[0], -1) * params.reshape(1, -1),
                       axis=1, keepdims=True)

    real = jnp.asarray(np.random.RandomState(1).randn(3, 2, 2, 4).astype(np.float32))
    fake = jnp.asarray(np.random.RandomState(2).randn(3, 2, 2, 4).astype(np.float32))
    mix = jnp.asarray([0.1, 0.5, 0.9], jnp.float32)
    lam, target = 10.0, 1.0
    gp = np.asarray(calc_gradient_penalty(d_apply, jnp.asarray(w.ravel()),
                                          real, fake, mix, lam, target))
    wnorm = np.linalg.norm(w.ravel())
    want = (wnorm - target) ** 2 * lam / target ** 2
    np.testing.assert_allclose(gp, want, rtol=1e-4)


def test_gradient_penalty_scaling():
    """Penalty scales as lambda / target^2 (wgan_gp_loss.py:31)."""
    def d_apply(params, x):
        return 3.0 * jnp.sum(x.reshape(x.shape[0], -1), axis=1, keepdims=True)

    real = jnp.ones((2, 2, 2, 1))
    fake = jnp.zeros((2, 2, 2, 1))
    mix = jnp.asarray([0.3, 0.7], jnp.float32)
    # grad is 3 per element, norm = 3*2 = 6 over 4 elements -> sqrt(4*9)=6
    gp1 = np.asarray(calc_gradient_penalty(d_apply, None, real, fake, mix, 10.0, 1.0))
    np.testing.assert_allclose(gp1, (6 - 1) ** 2 * 10.0, rtol=1e-5)
    gp2 = np.asarray(calc_gradient_penalty(d_apply, None, real, fake, mix, 10.0, 2.0))
    np.testing.assert_allclose(gp2, (6 - 2) ** 2 * 10.0 / 4.0, rtol=1e-5)


def test_d_loss_structure(models):
    (g, gp), (d, dp) = models
    depth, alpha = 1, 0.5

    def g_apply(p, z):
        return g.apply(p, z, depth, alpha)

    def d_apply(p, x):
        return d.apply(p, x, depth, alpha)

    real = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 8, 1))
    z = jax.random.normal(jax.random.PRNGKey(3), (4, 16))
    cost, (d_real, d_fake) = wgan_gp_D_loss(d_apply, g_apply, dp, gp, real, z,
                                            jax.random.PRNGKey(4))
    assert np.isfinite(float(cost))
    assert np.isfinite(float(d_real)) and np.isfinite(float(d_fake))


def test_d_loss_differentiable_grad_of_grad(models):
    """The outer grad w.r.t. D params must flow through the inner input-grad
    (double backward, wgan_gp_loss.py:25-28)."""
    (g, gp), (d, dp) = models
    depth, alpha = 0, 1.0

    def loss_fn(d_params):
        cost, _ = wgan_gp_D_loss(
            lambda p, x: d.apply(p, x, depth, alpha),
            lambda p, z: g.apply(p, z, depth, alpha),
            d_params, gp,
            jax.random.normal(jax.random.PRNGKey(5), (4, 4, 4, 1)),
            jax.random.normal(jax.random.PRNGKey(6), (4, 16)),
            jax.random.PRNGKey(7))
        return cost

    grads = jax.grad(loss_fn)(dp)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # gradient penalty must produce nonzero grads on conv weights
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


def test_g_loss_freezes_nothing_but_is_negative_mean_score(models):
    (g, gp), (d, dp) = models
    z = jax.random.normal(jax.random.PRNGKey(8), (4, 16))

    def g_apply(p, zz):
        return g.apply(p, zz, 0, 1.0)

    def d_apply(p, x):
        return d.apply(p, x, 0, 1.0)

    loss = wgan_gp_G_loss(g_apply, d_apply, gp, dp, z)
    want = -np.mean(np.asarray(d_apply(dp, g_apply(gp, z))))
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)


def test_d_loss_no_grad_into_generator(models):
    """G is frozen in the D step (wgan_gp_loss.py:51-52): grads of the D loss
    w.r.t. G params must be exactly zero."""
    (g, gp), (d, dp) = models

    def loss_fn(g_params):
        cost, _ = wgan_gp_D_loss(
            lambda p, x: d.apply(p, x, 0, 1.0),
            lambda p, z: g.apply(p, z, 0, 1.0),
            dp, g_params,
            jax.random.normal(jax.random.PRNGKey(9), (4, 4, 4, 1)),
            jax.random.normal(jax.random.PRNGKey(10), (4, 16)),
            jax.random.PRNGKey(11))
        return cost

    grads = jax.grad(loss_fn)(gp)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.asarray(leaf) == 0)
