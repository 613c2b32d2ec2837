"""Spatial-lanes Pallas 3x3 conv vs lax.conv (interpret mode on CPU; the
compiled kernel was validated bit-accurate and ~2x faster than XLA's conv at
the (3,16,1024,1024) config on TPU v5e — scripts/bench_pallas_conv.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pggan_tpu.ops.pallas_conv import conv3x3_small_c, supported


def reference(x_nchw, w):
    return jax.lax.conv_general_dilated(
        x_nchw.transpose(0, 2, 3, 1), w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")).transpose(0, 3, 1, 2)


@pytest.mark.parametrize("shape,cout", [((2, 5, 32, 128), 7),
                                        ((1, 3, 16, 256), 16),
                                        ((3, 16, 8, 128), 4)])
def test_matches_lax_conv(shape, cout):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, shape[1], cout).astype(np.float32))
    got = conv3x3_small_c(x, w, interpret=True)
    want = reference(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_supported_predicate():
    assert supported((1, 16, 1024, 1024), (3, 3, 16, 16))
    assert not supported((1, 16, 1024, 100), (3, 3, 16, 16))  # W % 128
    assert not supported((1, 16, 1024, 1024), (5, 5, 16, 16))  # kernel size
    assert not supported((1, 8, 1024, 1024), (3, 3, 16, 16))  # C mismatch


def test_edge_zero_padding_semantics():
    """Borders must see zero padding exactly like lax.conv 'same'."""
    x = jnp.ones((1, 2, 8, 128), jnp.float32)
    w = jnp.ones((3, 3, 2, 1), jnp.float32)
    got = np.asarray(conv3x3_small_c(x, w, interpret=True))[0, 0]
    want = np.asarray(reference(x, w))[0, 0]
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert got[0, 0] == pytest.approx(8.0)  # corner: 4 taps x 2 channels
    assert got[4, 64] == pytest.approx(18.0)  # interior: 9 taps x 2 channels


def test_custom_vjp_matches_lax(monkeypatch):
    import pggan_tpu.ops.pallas_conv as pc
    orig = pc.conv3x3_small_c
    monkeypatch.setattr(pc, "conv3x3_small_c",
                        lambda x, w: orig(x, w, interpret=True))
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 4, 16, 128).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32))

    def loss_p(x, w):
        return jnp.sum(jnp.sin(pc.conv3x3(x, w)))

    def loss_r(x, w):
        return jnp.sum(jnp.sin(pc._lax_conv(x, w)))

    gp = jax.grad(loss_p, argnums=(0, 1))(x, w)
    gr = jax.grad(loss_r, argnums=(0, 1))(x, w)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_ho_wrapper_grad_of_grad_matches_lax():
    """conv3x3_ho must survive reverse-over-reverse (the WGAN-GP pattern)
    with gradients equal to pure-lax."""
    import pggan_tpu.ops.pallas_conv as pc
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 4, 8, 128).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 4).astype(np.float32))

    def gp_like(fn, ww):
        gx = jax.grad(lambda xx: jnp.sum(fn(xx, ww)))(x)
        return jnp.sum(jnp.square(gx))

    o1 = jax.grad(lambda w_: gp_like(pc.conv3x3_ho, w_))(w)
    o2 = jax.grad(lambda w_: gp_like(pc._lax_conv, w_))(w)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=1e-4, atol=1e-4)


def test_discriminator_pallas_tail_matches_reference_path():
    """pallas_tail=True must be numerically identical to the NHWC path,
    including full WGAN-GP gradients."""
    from pggan_tpu.losses import wgan_gp_D_loss
    from pggan_tpu.models import Discriminator, Generator

    shape = (8, 3, 128, 128)
    d_p = Discriminator(shape, fmap_base=128, fmap_max=32, pallas_tail=True)
    d_p._pallas_min_res = 128
    d_r = Discriminator(shape, fmap_base=128, fmap_max=32)
    g = Generator(shape, latent_size=16, fmap_base=128, fmap_max=32)
    dp, gp = d_p.init(jax.random.PRNGKey(0)), g.init(jax.random.PRNGKey(1))
    assert d_p._use_pallas_entry(5)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 128, 128, 3))
    np.testing.assert_allclose(
        np.asarray(d_p.apply(dp, x, 5, 0.4)),
        np.asarray(d_r.apply(dp, x, 5, 0.4)), rtol=1e-4, atol=1e-5)

    z = jax.random.normal(jax.random.PRNGKey(3), (2, 16))

    def dloss(model, params):
        c, _ = wgan_gp_D_loss(lambda p, xx: model.apply(p, xx, 5, 0.5),
                              lambda p, zz: g.apply(p, zz, 5, 0.5),
                              params, gp, x, z, jax.random.PRNGKey(4))
        return c

    g1 = jax.grad(lambda p: dloss(d_p, p))(dp)
    g2 = jax.grad(lambda p: dloss(d_r, p))(dp)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
