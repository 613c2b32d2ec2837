"""Config-space sweep: every constructor option combination the reference
exposes must build, run, and differentiate at every depth (guards the
branches the happy-path tests never touch: relu models, no-pixelnorm, no
wscale, fmap_decay != 1, unusual latent sizes, non-square-ish fmap caps)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pggan_tpu.models import Discriminator, Generator
from pggan_tpu.ops.primitives import nf


@pytest.mark.parametrize("wscale,pixelnorm,leakyrelu,normalize_latents,fused",
                         [(True, True, True, True, True),
                          (False, False, False, False, True),
                          (True, False, True, False, False),
                          (False, True, False, True, True)])
def test_generator_option_matrix(wscale, pixelnorm, leakyrelu,
                                 normalize_latents, fused):
    g = Generator((8, 3, 32, 32), latent_size=24, fmap_base=96, fmap_max=48,
                  wscale=wscale, pixelnorm=pixelnorm, leakyrelu=leakyrelu,
                  normalize_latents=normalize_latents, fused_scale=fused)
    params = g.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 24))
    for depth in range(g.max_depth + 1):
        out = g.apply(params, z, depth, 0.5)
        assert out.shape == (2, 4 * 2 ** depth, 4 * 2 ** depth, 3)
        assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("wscale,pixelnorm,leakyrelu,fused",
                         [(True, False, True, True),
                          (False, True, False, False)])
def test_discriminator_option_matrix(wscale, pixelnorm, leakyrelu, fused):
    d = Discriminator((8, 3, 32, 32), fmap_base=96, fmap_max=48,
                      wscale=wscale, pixelnorm=pixelnorm, leakyrelu=leakyrelu,
                      fused_scale=fused)
    params = d.init(jax.random.PRNGKey(0))
    for depth in range(d.max_depth + 1):
        res = 4 * 2 ** depth
        x = jax.random.normal(jax.random.PRNGKey(2), (3, res, res, 3))
        out = d.apply(params, x, depth, 0.5)
        assert out.shape == (3, 1)
        assert np.isfinite(np.asarray(out)).all()


def test_fmap_decay_schedule():
    # fmap_decay != 1 changes the channel taper (reference network.py:94-95)
    vals = [nf(s, fmap_base=1024, fmap_decay=1.5, fmap_max=256)
            for s in range(6)]
    assert vals[0] == 256
    assert all(a >= b for a, b in zip(vals, vals[1:]))  # non-increasing
    g = Generator((4, 1, 32, 32), latent_size=16, fmap_base=1024,
                  fmap_decay=1.5, fmap_max=64)
    params = g.init(jax.random.PRNGKey(0))
    out = g.apply(params, jnp.ones((1, 16)), g.max_depth, 1.0)
    assert np.isfinite(np.asarray(out)).all()


def test_latent_size_none_uses_nf0():
    g = Generator((4, 1, 16, 16), latent_size=None, fmap_base=128,
                  fmap_max=32)
    assert g.latent_size == nf(0, 128, 1.0, 32) == 32


def test_gradients_flow_in_all_option_combos():
    """End-to-end grad through G+D for the non-default option set."""
    g = Generator((8, 1, 16, 16), latent_size=8, fmap_base=32, fmap_max=16,
                  wscale=False, pixelnorm=False, leakyrelu=False,
                  normalize_latents=False)
    d = Discriminator((8, 1, 16, 16), fmap_base=32, fmap_max=16,
                      wscale=False, pixelnorm=True, leakyrelu=False)
    gp, dp = g.init(jax.random.PRNGKey(0)), d.init(jax.random.PRNGKey(1))
    z = jax.random.normal(jax.random.PRNGKey(2), (4, 8))

    def loss(gp):
        return jnp.mean(-d.apply(dp, g.apply(gp, z, 2, 0.7), 2, 0.7))

    grads = jax.grad(loss)(gp)
    norms = [float(jnp.abs(l).max())
             for l in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(n) for n in norms)
    assert max(norms) > 0
