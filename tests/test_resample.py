"""The 2x resample pair (ops/resample.py): nearest-upsample and average
pool as mutually-transposed linear primitives. Parity vs naive lax
formulations at every AD order the training step uses (including the
WGAN-GP grad-of-grad), in both the NHWC and NHCW layouts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pggan_tpu.ops.resample import avg_pool_2x, upsample_2x


def _refs(h_axis, w_axis):
    def up_ref(v):
        v = jnp.repeat(v, 2, axis=h_axis)
        return jnp.repeat(v, 2, axis=w_axis)

    def pool_ref(v):
        dims = [1] * v.ndim
        dims[h_axis] = dims[w_axis] = 2
        return jax.lax.reduce_window(
            v, 0.0, jax.lax.add, tuple(dims), tuple(dims), "VALID") * 0.25

    return up_ref, pool_ref


@pytest.mark.parametrize("h_axis,w_axis,shape",
                         [(1, 3, (2, 8, 5, 6)),    # NHCW
                          (1, 2, (2, 8, 6, 5))])   # NHWC
def test_matches_reference_all_orders(h_axis, w_axis, shape):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(*shape).astype(np.float32))
    up_ref, pool_ref = _refs(h_axis, w_axis)
    up = lambda v: upsample_2x(v, h_axis, w_axis)           # noqa: E731
    pool = lambda v: avg_pool_2x(v, h_axis, w_axis)         # noqa: E731

    np.testing.assert_allclose(up(x), up_ref(x))
    np.testing.assert_allclose(pool(x), pool_ref(x))

    for f, fr in ((up, up_ref), (pool, pool_ref)):
        g1 = jax.grad(lambda v: jnp.sum(jnp.sin(f(v))))(x)
        g2 = jax.grad(lambda v: jnp.sum(jnp.sin(fr(v))))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=1e-6)

        def gp(fn, s):
            # the WGAN-GP pattern: grad of a scalar of the input-gradient
            gx = jax.grad(lambda v: jnp.sum(jnp.tanh(fn(v * s))))(x)
            return jnp.sum(jnp.square(gx))

        o1 = jax.grad(lambda s: gp(f, s))(jnp.float32(1.1))
        o2 = jax.grad(lambda s: gp(fr, s))(jnp.float32(1.1))
        np.testing.assert_allclose(float(o1), float(o2), rtol=1e-5)


def test_vmap():
    rs = np.random.RandomState(1)
    xv = jnp.asarray(rs.randn(3, 2, 8, 5, 6).astype(np.float32))
    up_ref, pool_ref = _refs(1, 3)
    np.testing.assert_allclose(
        jax.vmap(lambda v: upsample_2x(v, 1, 3))(xv), jax.vmap(up_ref)(xv))
    np.testing.assert_allclose(
        jax.vmap(lambda v: avg_pool_2x(v, 1, 3))(xv), jax.vmap(pool_ref)(xv))


def test_transposes_are_adjoint():
    """<ct, up(x)> == <up^T(ct), x> and likewise for the pool."""
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(1, 4, 3, 6).astype(np.float32))
    ct = jnp.asarray(rs.randn(1, 8, 3, 12).astype(np.float32))
    lhs = jnp.vdot(ct, upsample_2x(x, 1, 3))
    upt = jax.linear_transpose(lambda v: upsample_2x(v, 1, 3), x)
    rhs = jnp.vdot(upt(ct)[0], x)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-6)

    poolt = jax.linear_transpose(lambda v: avg_pool_2x(v, 1, 3), ct)
    lhs = jnp.vdot(x, avg_pool_2x(ct, 1, 3))
    rhs = jnp.vdot(poolt(x)[0], ct)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-6)


class TestPallasNHCWKernels:
    """The spatial-lanes (NHCW) Pallas streaming impls behind the same
    primitives: parity with the XLA formulations, incl. grads (the
    transpose binds the partner primitive, so the kernels serve every
    derivative order)."""

    def _refs(self):
        pool = lambda x: jax.lax.reduce_window(  # noqa: E731
            x, 0.0, jax.lax.add, (1, 2, 1, 2), (1, 2, 1, 2), "VALID") * 0.25
        up = lambda x: jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=3)  # noqa: E731
        return pool, up

    def test_kernels_match_xla(self):
        from pggan_tpu.ops.pallas_resample import (avgpool2x_nhcw,
                                                   pool_supported,
                                                   up_supported,
                                                   upsample2x_nhcw)
        pool_ref, up_ref = self._refs()
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(2, 16, 8, 256).astype(np.float32))
        assert pool_supported(x.shape) and up_supported(x.shape)
        np.testing.assert_allclose(np.asarray(avgpool2x_nhcw(x)),
                                   np.asarray(pool_ref(x)),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(upsample2x_nhcw(x)),
                                   np.asarray(up_ref(x)), rtol=1e-6)

    def test_primitive_dispatch_and_grads(self):
        """Through the primitives (which dispatch to the kernels for
        supported NHCW shapes): values and gradients match XLA."""
        pool_ref, up_ref = self._refs()
        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.randn(1, 8, 8, 256).astype(np.float32))
        np.testing.assert_allclose(np.asarray(avg_pool_2x(x, 1, 3)),
                                   np.asarray(pool_ref(x)),
                                   rtol=1e-5, atol=1e-6)
        g1 = jax.grad(lambda x: jnp.sum(jnp.sin(avg_pool_2x(x, 1, 3))))(x)
        g2 = jax.grad(lambda x: jnp.sum(jnp.sin(pool_ref(x))))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-5, atol=1e-6)
        g3 = jax.grad(lambda x: jnp.sum(jnp.sin(upsample_2x(x, 1, 3))))(x)
        g4 = jax.grad(lambda x: jnp.sum(jnp.sin(up_ref(x))))(x)
        np.testing.assert_allclose(np.asarray(g3), np.asarray(g4),
                                   rtol=1e-5, atol=1e-6)

    def test_unsupported_shapes_fall_back(self):
        """C=3 images and odd widths stay on the XLA formulations."""
        pool_ref, up_ref = self._refs()
        rng = np.random.RandomState(5)
        for shape in ((1, 8, 3, 256), (1, 8, 8, 192)):
            x = jnp.asarray(rng.randn(*shape).astype(np.float32))
            np.testing.assert_allclose(np.asarray(avg_pool_2x(x, 1, 3)),
                                       np.asarray(pool_ref(x)),
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(upsample_2x(x, 1, 3)),
                                       np.asarray(up_ref(x)), rtol=1e-6)
