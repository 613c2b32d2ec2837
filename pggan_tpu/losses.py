"""WGAN-GP losses as pure functions (reference wgan_gp_loss.py).

The gradient penalty's double backward (torch ``autograd.grad(create_graph=
True)``, reference wgan_gp_loss.py:25-28) becomes ``jax.grad`` of the critic
w.r.t. the mixed inputs *inside* the D loss; the outer ``jax.grad`` over D's
params then differentiates through it (grad-of-grad), all fused by XLA into
the single train step.

Semantics preserved exactly (wgan_gp_loss.py:36-65):
  D_cost = mean( D(fake) + (-D(real) + D(real)^2 * iwass_epsilon)
                 + (||grad_xhat D(xhat)||_2 - target)^2 * lambda / target^2 )
with xhat = (1-eps)*real + eps*fake, eps ~ U(0,1) per sample
(wgan_gp_loss.py:17-19), G frozen via stop_gradient (wgan_gp_loss.py:51-52).

Note the reference computes d(sum of scores)/d(xhat) with ones grad_outputs —
because minibatch-stddev couples samples, per-sample gradients are NOT
independent; ``jax.grad`` of the summed scores reproduces the coupling
exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def calc_gradient_penalty(d_apply, d_params, real, fake, mix_eps,
                          iwass_lambda: float = 10.0,
                          iwass_target: float = 1.0) -> jax.Array:
    """Per-sample gradient penalty (reference wgan_gp_loss.py:13-33).

    mix_eps: (N,) uniform mixing factors (the reference's row-wise
    ``mixing_factors``, wgan_gp_loss.py:15-19).
    """
    eps = mix_eps.reshape((-1,) + (1,) * (real.ndim - 1)).astype(real.dtype)
    mixed = real * (1.0 - eps) + fake * eps

    def summed_score(x):
        return jnp.sum(d_apply(d_params, x))

    grads = jax.grad(summed_score)(mixed)
    grads = grads.reshape(grads.shape[0], -1)
    norms = jnp.sqrt(jnp.sum(jnp.square(grads), axis=1) + 1e-12)
    return jnp.square(norms - iwass_target) * (iwass_lambda / iwass_target ** 2)


def wgan_gp_D_loss(d_apply, g_apply, d_params, g_params, real, latents, rng,
                   iwass_lambda: float = 10.0,
                   iwass_epsilon: float = 0.001,
                   iwass_target: float = 1.0,
                   d_apply_pair=None):
    """D loss (reference wgan_gp_loss.py:36-65). Returns (cost, aux).

    aux = (mean D_real_loss, mean D_fake_loss) mirroring the reference's
    ``return_all`` tuple (wgan_gp_loss.py:63-65), reduced to means since
    that is what the loss monitors consume (plugins.py:109-111).

    ``d_apply_pair``: optional ``(params, x2) -> (2N, 1)`` critic over a
    concatenated [reals; fakes] batch with per-half minibatch-stddev
    statistics (Discriminator.apply ``stat_groups=2``) — EXACTLY equal to
    two separate ``d_apply`` calls, but one fused device pass (fewer op
    dispatches, fuller MXU; the GP pass stays separate because its inner
    input-gradient must cover only the mixed batch).
    """
    fake = jax.lax.stop_gradient(g_apply(g_params, latents))
    if d_apply_pair is not None and real.shape == fake.shape:
        both = d_apply_pair(d_params, jnp.concatenate([real, fake], axis=0))
        d_real, d_fake_loss = both[:real.shape[0]], both[real.shape[0]:]
    else:
        d_real = d_apply(d_params, real)
        d_fake_loss = d_apply(d_params, fake)
    d_real_loss = -d_real + jnp.square(d_real) * iwass_epsilon

    mix_eps = jax.random.uniform(rng, (real.shape[0],), real.dtype)
    gp = calc_gradient_penalty(d_apply, d_params,
                               jax.lax.stop_gradient(real),
                               fake, mix_eps, iwass_lambda, iwass_target)

    d_cost = jnp.mean(d_fake_loss.ravel() + d_real_loss.ravel() + gp)
    return d_cost, (jnp.mean(d_real_loss), jnp.mean(d_fake_loss))


def wgan_gp_G_loss(g_apply, d_apply, g_params, d_params, latents):
    """G loss: ``mean(-D(G(z)))`` (reference wgan_gp_loss.py:68-74)."""
    fake = g_apply(g_params, latents)
    return jnp.mean(-d_apply(d_params, fake))
