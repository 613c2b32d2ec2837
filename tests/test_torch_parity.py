"""Golden-value parity vs PyTorch semantics (SURVEY.md §4 "parity tests vs
reference semantics").

The reference implementation targets torch 0.2 and cannot be imported, so
these tests rebuild its layer math with modern torch ops on CPU and compare
against our NHWC/JAX implementations on identical weights: convolution
(incl. the equalized-LR scaling), lrelu+pixelnorm chain, minibatch-stddev,
pooling/upsampling, and — most importantly — the WGAN-GP gradient penalty's
double backward against ``torch.autograd.grad(create_graph=True)``.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pggan_tpu.losses import calc_gradient_penalty  # noqa: E402
from pggan_tpu.ops.primitives import (  # noqa: E402
    avg_pool_2x,
    equalized_conv2d,
    he_constant,
    minibatch_stddev,
    pixelnorm,
    upsample_nearest_2x,
)

RNG = np.random.RandomState(0)


def to_nchw(x_nhwc):
    return np.transpose(x_nhwc, (0, 3, 1, 2))


def to_nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


def test_conv_lrelu_pixelnorm_chain_matches_torch():
    """PGConv2d forward semantics (reference network.py:32-41): torch conv on
    c-scaled input + LeakyReLU(0.2) + pixelnorm vs our fused NHWC op."""
    ch_in, ch_out, k = 5, 7, 3
    x = RNG.randn(2, 8, 8, ch_in).astype(np.float32)
    w_oihw = RNG.randn(ch_out, ch_in, k, k).astype(np.float32)
    b = RNG.randn(ch_out).astype(np.float32)
    c = he_constant(k * k * ch_in)

    tx = torch.from_numpy(to_nchw(x)) * c
    ty = torch.nn.functional.conv2d(tx, torch.from_numpy(w_oihw),
                                    torch.from_numpy(b), padding=1)
    ty = torch.nn.functional.leaky_relu(ty, 0.2)
    mean = (ty * ty).mean(dim=1, keepdim=True)
    ty = ty * torch.rsqrt(mean + 1e-8)
    want = to_nhwc(ty.numpy())

    w_hwio = np.transpose(w_oihw, (2, 3, 1, 0))  # OIHW -> HWIO
    got = np.asarray(equalized_conv2d(
        {"w": jnp.asarray(w_hwio), "b": jnp.asarray(b)}, jnp.asarray(x),
        padding=1, act="lrelu", use_pixelnorm=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_minibatch_stddev_matches_torch():
    """Tstdeps (reference network.py:174-187): global scalar over the whole
    tensor."""
    x = RNG.randn(4, 6, 6, 3).astype(np.float32)
    tx = torch.from_numpy(to_nchw(x))
    t_std = torch.sqrt(((tx - tx.mean()) ** 2).mean() + 1e-8)
    got = np.asarray(minibatch_stddev(jnp.asarray(x)))
    np.testing.assert_allclose(got[..., -1], float(t_std), rtol=1e-5)


def test_avg_pool_matches_torch():
    x = RNG.randn(2, 8, 8, 4).astype(np.float32)
    want = to_nhwc(torch.nn.functional.avg_pool2d(
        torch.from_numpy(to_nchw(x)), 2).numpy())
    got = np.asarray(avg_pool_2x(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_upsample_matches_torch():
    x = RNG.randn(2, 4, 4, 3).astype(np.float32)
    want = to_nhwc(torch.nn.functional.interpolate(
        torch.from_numpy(to_nchw(x)), scale_factor=2, mode="nearest").numpy())
    got = np.asarray(upsample_nearest_2x(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_pixelnorm_matches_torch():
    x = RNG.randn(3, 4, 4, 8).astype(np.float32)
    tx = torch.from_numpy(to_nchw(x))
    want = to_nhwc((tx * torch.rsqrt((tx * tx).mean(1, keepdim=True)
                                     + 1e-8)).numpy())
    got = np.asarray(pixelnorm(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_gradient_penalty_double_backward_matches_torch():
    """The decisive parity test: our jax.grad-inside-loss gradient penalty vs
    torch's autograd.grad(create_graph=True) (reference wgan_gp_loss.py:13-33),
    including the second-order gradients w.r.t. critic parameters."""
    ch, k = 3, 3
    w_oihw = (RNG.randn(1, ch, k, k) * 0.3).astype(np.float32)
    real = RNG.randn(4, 6, 6, ch).astype(np.float32)
    fake = RNG.randn(4, 6, 6, ch).astype(np.float32)
    mix = RNG.rand(4).astype(np.float32)
    lam, target = 10.0, 1.0

    # --- torch: critic = sum over spatial of conv(x, w), per-sample score
    tw = torch.from_numpy(w_oihw).requires_grad_(True)

    def t_critic(x_nchw):
        return torch.nn.functional.conv2d(x_nchw, tw, padding=1).sum((1, 2, 3))

    t_real = torch.from_numpy(to_nchw(real))
    t_fake = torch.from_numpy(to_nchw(fake))
    t_mix = torch.from_numpy(mix).view(-1, 1, 1, 1)
    mixed = (t_real * (1 - t_mix) + t_fake * t_mix).requires_grad_(True)
    scores = t_critic(mixed)
    grads = torch.autograd.grad(scores.sum(), mixed, create_graph=True)[0]
    gnorm = grads.reshape(grads.shape[0], -1).norm(2, dim=1)
    gp_t = ((gnorm - target) ** 2) * lam / target ** 2
    gp_t.mean().backward()
    want_gp = gp_t.detach().numpy()
    want_dw = tw.grad.numpy()

    # --- ours
    w_hwio = jnp.asarray(np.transpose(w_oihw, (2, 3, 1, 0)))

    def d_apply(params, x):
        y = jax.lax.conv_general_dilated(
            x, params, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y, axis=(1, 2, 3))[:, None]

    got_gp = np.asarray(calc_gradient_penalty(
        d_apply, w_hwio, jnp.asarray(real), jnp.asarray(fake),
        jnp.asarray(mix), lam, target))
    np.testing.assert_allclose(got_gp, want_gp, rtol=1e-4, atol=1e-5)

    def gp_mean(params):
        return jnp.mean(calc_gradient_penalty(
            d_apply, params, jnp.asarray(real), jnp.asarray(fake),
            jnp.asarray(mix), lam, target))

    got_dw = np.asarray(jax.grad(gp_mean)(w_hwio))
    got_dw_oihw = np.transpose(got_dw, (3, 2, 0, 1))
    np.testing.assert_allclose(got_dw_oihw, want_dw, rtol=1e-3, atol=1e-4)


def test_adam_update_matches_torch():
    """Our scale_by_adam + apply_updates vs torch.optim.Adam with the
    reference's betas (0.0, 0.99) over several steps."""
    import optax
    from pggan_tpu.training.state import apply_updates, make_optimizer

    w0 = RNG.randn(6).astype(np.float32)
    grads_seq = [RNG.randn(6).astype(np.float32) for _ in range(5)]
    lr = 1e-3

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.Adam([tw], lr=lr, betas=(0.0, 0.99), eps=1e-8)
    for g in grads_seq:
        topt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        topt.step()
    want = tw.detach().numpy()

    opt = make_optimizer(b1=0.0, b2=0.99, eps=1e-8)
    params = jnp.asarray(w0)
    state = opt.init(params)
    for g in grads_seq:
        updates, state = opt.update(jnp.asarray(g), state, params)
        params = apply_updates(params, updates, lr)
    np.testing.assert_allclose(np.asarray(params), want, rtol=1e-5, atol=1e-6)
