"""Fused forward-only conv3x3->conv3x3 serving chain (ops/pallas_chain.py):
parity vs the composed reference, Generator integration, and the
fails-loudly-under-AD contract. Interpret mode on CPU; the compiled Mosaic
kernel is re-verified on the real chip (scripts/ab_chain_serving.py,
BASELINE.md round 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pggan_tpu.ops.pallas_chain import chain_supported, conv3x3_chain
from pggan_tpu.ops.pallas_conv import _lax_conv


def _ep(z, b, slope, pn_eps):
    z = z + b[None, None, :, None]
    z = jnp.where(z >= 0, z, slope * z)
    if pn_eps is not None:
        z = z * jax.lax.rsqrt(jnp.mean(z * z, axis=2, keepdims=True) + pn_eps)
    return z


@pytest.mark.parametrize("n,h,c,k1,k2,w,pn,th", [
    (2, 16, 8, 16, 8, 128, 1e-8, 8),    # T=2, pixelnorm on
    (1, 32, 16, 8, 8, 128, None, 16),   # T=2, pixelnorm off
    (2, 8, 8, 8, 16, 256, 1e-8, 8),     # T=1 (whole image one tile)
    (1, 32, 8, 8, 8, 128, 1e-8, 8),     # T=4 (interior tiles both sides)
])
def test_chain_matches_composition(n, h, c, k1, k2, w, pn, th):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, h, c, w).astype(np.float32))
    w1 = jnp.asarray(rng.randn(3, 3, c, k1).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.randn(k1).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(3, 3, k1, k2).astype(np.float32) * 0.2)
    b2 = jnp.asarray(rng.randn(k2).astype(np.float32) * 0.1)
    got = conv3x3_chain(x, w1, b1, w2, b2, slope=0.2, pn_eps=pn, th=th)
    want = _ep(_lax_conv(_ep(_lax_conv(x, w1), b1, 0.2, pn), w2),
               b2, 0.2, pn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_chain_supported_gates():
    ok = ((2, 16, 8, 128), (3, 3, 8, 16), (3, 3, 16, 8))
    assert chain_supported(*ok)
    assert not chain_supported((2, 16, 12, 128), (3, 3, 12, 16),
                               (3, 3, 16, 8))   # C % 8
    assert not chain_supported((2, 16, 8, 100), (3, 3, 8, 16),
                               (3, 3, 16, 8))   # W % 128
    assert not chain_supported((2, 15, 8, 128), (3, 3, 8, 16),
                               (3, 3, 16, 8))   # H % 8
    assert not chain_supported((2, 16, 8, 128), (3, 3, 8, 12),
                               (3, 3, 12, 8))   # K1 % 8


def test_generator_inference_chain_matches_unchained():
    """Generator.inference_chain=True must serve the same images as the
    default tail (the chain fuses each block's conv pair; same math, no
    HBM round-trip) — fade and stable graphs."""
    from pggan_tpu.models import Generator

    shape = (8, 3, 128, 128)
    g = Generator(shape, latent_size=16, fmap_base=512, fmap_max=32)
    g_c = Generator(shape, latent_size=16, fmap_base=512, fmap_max=32,
                    inference_chain=True)
    assert g._pallas_tail_start(5) is not None
    params = g.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 16))
    for fade, alpha in ((True, 0.4), (False, 1.0)):
        a = jax.jit(lambda p, zz: g.apply(p, zz, 5, alpha, fade))(params, z)
        b = jax.jit(lambda p, zz: g_c.apply(p, zz, 5, alpha, fade))(params, z)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_inference_chain_fails_loudly_under_ad():
    """The chain kernel is forward-only by construction: differentiating
    through it must raise, never silently fall back (training uses the
    per-conv any-order-AD primitives instead)."""
    from pggan_tpu.models import Generator

    shape = (8, 3, 128, 128)
    g_c = Generator(shape, latent_size=16, fmap_base=512, fmap_max=32,
                    inference_chain=True)
    params = g_c.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 16))
    with pytest.raises(Exception):
        jax.grad(lambda p: jnp.sum(g_c.apply(p, z, 5, 1.0, False)))(params)
