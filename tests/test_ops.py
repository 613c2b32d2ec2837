"""Unit tests for core math primitives vs the reference formulas
(SURVEY.md §2.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pggan_tpu.ops import (
    avg_pool_2x,
    conv_init,
    equalized_conv2d,
    he_constant,
    minibatch_stddev,
    nf,
    pixelnorm,
    upsample_nearest_2x,
)


def test_nf_schedule_defaults():
    # reference network.py:94-95 with defaults fmap_base=4096, decay=1, max=512
    expected = {0: 512, 1: 512, 2: 512, 3: 512, 4: 256, 5: 128, 6: 64, 7: 32, 8: 16}
    for stage, want in expected.items():
        assert nf(stage) == want


def test_pixelnorm_formula():
    x = np.random.RandomState(0).randn(2, 4, 4, 8).astype(np.float32)
    got = pixelnorm(jnp.asarray(x))
    want = x / np.sqrt((x ** 2).mean(axis=-1, keepdims=True) + 1e-8)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_pixelnorm_unit_rms():
    x = jnp.asarray(np.random.RandomState(1).randn(3, 2, 2, 16).astype(np.float32))
    y = pixelnorm(x)
    rms = jnp.sqrt(jnp.mean(y * y, axis=-1))
    np.testing.assert_allclose(np.asarray(rms), 1.0, atol=1e-3)


def test_minibatch_stddev_value_and_shape():
    # reference Tstdeps (network.py:174-175): sqrt(mean((x-mean)^2) + 1e-8),
    # one global scalar broadcast as an extra channel.
    x = np.random.RandomState(2).randn(4, 8, 8, 3).astype(np.float32)
    out = np.asarray(minibatch_stddev(jnp.asarray(x)))
    assert out.shape == (4, 8, 8, 4)
    want = np.sqrt(((x - x.mean()) ** 2).mean() + 1e-8)
    np.testing.assert_allclose(out[..., -1], want, rtol=1e-5)
    np.testing.assert_allclose(out[..., :3], x)


def test_upsample_nearest_2x():
    x = jnp.arange(2 * 2 * 2 * 1, dtype=jnp.float32).reshape(2, 2, 2, 1)
    y = np.asarray(upsample_nearest_2x(x))
    assert y.shape == (2, 4, 4, 1)
    np.testing.assert_allclose(y[0, :, :, 0],
                               np.repeat(np.repeat(np.asarray(x)[0, :, :, 0], 2, 0), 2, 1))


def test_avg_pool_2x_inverts_upsample():
    x = jnp.asarray(np.random.RandomState(3).randn(2, 8, 8, 4).astype(np.float32))
    np.testing.assert_allclose(np.asarray(avg_pool_2x(upsample_nearest_2x(x))),
                               np.asarray(x), rtol=1e-5, atol=1e-6)


def test_he_constant():
    assert he_constant(9 * 64) == pytest.approx(np.sqrt(2.0 / (9 * 64)))


def test_equalized_conv_scaling():
    # With wscale, the effective weight is w * sqrt(2/fan_in): a conv with
    # all-ones stored weights on all-ones input must produce fan_in * c.
    key = jax.random.PRNGKey(0)
    p = conv_init(key, 3, 4, 8, wscale=True)
    p = {"w": jnp.ones_like(p["w"]), "b": jnp.zeros_like(p["b"])}
    x = jnp.ones((1, 5, 5, 4))
    y = equalized_conv2d(p, x, padding=1, act=None, use_pixelnorm=False)
    fan_in = 3 * 3 * 4
    np.testing.assert_allclose(np.asarray(y)[0, 2, 2, 0],
                               fan_in * he_constant(fan_in), rtol=1e-5)


def test_equalized_conv_lrelu():
    key = jax.random.PRNGKey(1)
    p = conv_init(key, 1, 1, 1, wscale=False)
    p = {"w": jnp.ones_like(p["w"]), "b": jnp.zeros_like(p["b"])}
    x = jnp.asarray([[-1.0, 2.0]]).reshape(1, 1, 2, 1)
    y = equalized_conv2d(p, x, padding=0, wscale=False, act="lrelu",
                         use_pixelnorm=False)
    np.testing.assert_allclose(np.asarray(y).ravel(), [-0.2, 2.0], rtol=1e-6)


def test_conv_init_unit_variance_with_wscale():
    key = jax.random.PRNGKey(42)
    p = conv_init(key, 3, 128, 128, wscale=True)
    assert np.asarray(p["w"]).std() == pytest.approx(1.0, abs=0.01)
    # bias keeps torch Conv2d's default uniform(+-1/sqrt(fan_in)) init
    # (reference network.py:16-17 only re-inits the weight)
    bound = 1.0 / np.sqrt(9 * 128)
    b = np.asarray(p["b"])
    assert np.all(np.abs(b) <= bound) and b.std() > 0
