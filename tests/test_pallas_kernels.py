"""Pallas fused epilogue kernel vs the plain JAX reference (interpret mode on
CPU; the compiled path is exercised by scripts/bench_pallas.py on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from pggan_tpu.ops.pallas_kernels import fused_act_pixelnorm
from pggan_tpu.ops.primitives import leaky_relu, pixelnorm


def reference(z, b, eps=1e-8):
    return pixelnorm(leaky_relu(z + b), eps)


def test_forward_matches_reference():
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(2, 4, 8, 16).astype(np.float32))
    b = jnp.asarray(rng.randn(16).astype(np.float32))
    got = fused_act_pixelnorm(z, b, 1e-8, True)
    want = reference(z, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_gradient_matches_reference():
    rng = np.random.RandomState(1)
    z = jnp.asarray(rng.randn(1, 4, 4, 8).astype(np.float32))
    b = jnp.asarray(rng.randn(8).astype(np.float32))

    def loss_pallas(z, b):
        return jnp.sum(jnp.sin(fused_act_pixelnorm(z, b, 1e-8, True)))

    def loss_ref(z, b):
        return jnp.sum(jnp.sin(reference(z, b)))

    gz_p, gb_p = jax.grad(loss_pallas, argnums=(0, 1))(z, b)
    gz_r, gb_r = jax.grad(loss_ref, argnums=(0, 1))(z, b)
    np.testing.assert_allclose(np.asarray(gz_p), np.asarray(gz_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_r),
                               rtol=1e-4, atol=1e-5)


def test_odd_row_counts_fall_back_to_small_blocks():
    rng = np.random.RandomState(2)
    z = jnp.asarray(rng.randn(1, 3, 3, 4).astype(np.float32))  # 9 rows
    b = jnp.zeros((4,), jnp.float32)
    got = fused_act_pixelnorm(z, b, 1e-8, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(reference(z, b)),
                               rtol=1e-5, atol=1e-6)
