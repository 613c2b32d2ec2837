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
