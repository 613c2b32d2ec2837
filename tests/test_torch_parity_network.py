"""Whole-network fp32 output parity vs the PyTorch reference (north star:
"outputs match PyTorch reference within fp32 tolerance").

tests/test_torch_parity.py pins the layer math; this file pins the
*composition*: the reference ``Generator``/``Discriminator``
(network.py:75-240) are rebuilt in modern torch (the original targets
torch 0.2 and cannot be imported), identical weights are transplanted from
our init, and full-network outputs are compared at every depth x alpha —
fade blends included — for fused_scale on/off and with the Pallas
spatial-lanes span engaged, plus the D-loss scalar
(wgan_gp_loss.py:36-65). Composition bugs (block indexing, blend order,
fused-scale reassociation drift across stages) are exactly what the layer
tests cannot see.

The one intentional difference: the reference computes its equalized-LR
constant empirically from a kaiming init (network.py:19); we use the
closed-form He constant. The torch rebuild here uses the same closed form,
so these tests compare network composition, not that (separately
documented and tested) substitution.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402
from torch.nn import functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pggan_tpu.losses import calc_gradient_penalty  # noqa: E402
from pggan_tpu.models import Discriminator, Generator  # noqa: E402
from pggan_tpu.ops.primitives import he_constant, nf  # noqa: E402


# ---------------------------------------------------------------------------
# Reference network rebuilt in modern torch (network.py:7-240)
# ---------------------------------------------------------------------------

class TPGConv(nn.Module):
    """PGConv2d (network.py:7-41) with the closed-form wscale constant."""

    def __init__(self, ch_in, ch_out, ksize=3, stride=1, pad=1,
                 pixelnorm=True, wscale=True, act="lrelu"):
        super().__init__()
        self.conv = nn.Conv2d(ch_in, ch_out, ksize, stride, pad)
        self.c = he_constant(ksize * ksize * ch_in) if wscale else 1.0
        self.pixelnorm = pixelnorm
        self.act = ({"lrelu": nn.LeakyReLU(0.2), "relu": nn.ReLU()}[act]
                    if act is not None else None)
        self.eps = 1e-8

    def forward(self, x):
        h = self.conv(x * self.c)
        if self.act is not None:
            h = self.act(h)
        if self.pixelnorm:
            h = h * torch.rsqrt((h * h).mean(1, keepdim=True) + self.eps)
        return h


class TGFirstBlock(nn.Module):  # network.py:44-57
    def __init__(self, ch_in, ch_out, num_channels, **ls):
        super().__init__()
        self.c1 = TPGConv(ch_in, ch_out, 4, 1, 3, **ls)
        self.c2 = TPGConv(ch_out, ch_out, **ls)
        self.toRGB = TPGConv(ch_out, num_channels, ksize=1, pad=0,
                             pixelnorm=False, act=None)

    def forward(self, x, last=False):
        x = self.c2(self.c1(x))
        return self.toRGB(x) if last else x


class TGBlock(nn.Module):  # network.py:60-72
    def __init__(self, ch_in, ch_out, num_channels, **ls):
        super().__init__()
        self.c1 = TPGConv(ch_in, ch_out, **ls)
        self.c2 = TPGConv(ch_out, ch_out, **ls)
        self.toRGB = TPGConv(ch_out, num_channels, ksize=1, pad=0,
                             pixelnorm=False, act=None)

    def forward(self, x, last=False):
        x = self.c2(self.c1(x))
        return self.toRGB(x) if last else x


class TGenerator(nn.Module):  # network.py:75-139
    def __init__(self, dataset_shape, fmap_base, fmap_max, latent_size):
        super().__init__()
        resolution, num_channels = dataset_shape[-1], dataset_shape[1]
        R = int(np.log2(resolution))
        f = lambda s: nf(s, fmap_base, 1.0, fmap_max)  # noqa: E731
        ls = {"wscale": True, "pixelnorm": True, "act": "lrelu"}
        self.normalize_latents = True
        self.block0 = TGFirstBlock(latent_size, f(1), num_channels, **ls)
        self.blocks = nn.ModuleList([
            TGBlock(f(i - 1), f(i), num_channels, **ls)
            for i in range(2, R)])
        self.depth, self.alpha, self.eps = 0, 1.0, 1e-8

    def forward(self, x):
        h = x.unsqueeze(2).unsqueeze(3)
        if self.normalize_latents:
            h = h * torch.rsqrt((h * h).mean(1, keepdim=True) + self.eps)
        h = self.block0(h, self.depth == 0)
        if self.depth > 0:
            for i in range(self.depth - 1):
                h = F.interpolate(h, scale_factor=2, mode="nearest")
                h = self.blocks[i](h)
            h = F.interpolate(h, scale_factor=2, mode="nearest")
            ult = self.blocks[self.depth - 1](h, True)
            if self.alpha < 1.0:
                prev = (self.blocks[self.depth - 2].toRGB(h)
                        if self.depth > 1 else self.block0.toRGB(h))
            else:
                prev = 0
            h = prev * (1 - self.alpha) + ult * self.alpha
        return h


class TDBlock(nn.Module):  # network.py:142-154
    def __init__(self, ch_in, ch_out, num_channels, **ls):
        super().__init__()
        self.fromRGB = TPGConv(num_channels, ch_in, ksize=1, pad=0,
                               pixelnorm=False)
        self.c1 = TPGConv(ch_in, ch_in, **ls)
        self.c2 = TPGConv(ch_in, ch_out, **ls)

    def forward(self, x, first=False):
        if first:
            x = self.fromRGB(x)
        return self.c2(self.c1(x))


class TDLastBlock(nn.Module):  # network.py:157-187
    def __init__(self, ch_in, ch_out, num_channels, **ls):
        super().__init__()
        self.fromRGB = TPGConv(num_channels, ch_in, ksize=1, pad=0,
                               pixelnorm=False)
        self.c1 = TPGConv(ch_in + 1, ch_in, **ls)
        self.c2 = TPGConv(ch_in, ch_out, 4, 1, 0, **ls)

    def forward(self, x, first=False):
        if first:
            x = self.fromRGB(x)
        std = torch.sqrt(((x - x.mean()) ** 2).mean() + 1.0e-8)
        x = torch.cat((x, std.expand(x.size(0), 1, x.size(2), x.size(3))), 1)
        return self.c2(self.c1(x))


class TDiscriminator(nn.Module):  # network.py:190-240
    def __init__(self, dataset_shape, fmap_base, fmap_max):
        super().__init__()
        resolution, num_channels = dataset_shape[-1], dataset_shape[1]
        R = int(np.log2(resolution))
        f = lambda s: nf(s, fmap_base, 1.0, fmap_max)  # noqa: E731
        ls = {"wscale": True, "pixelnorm": False, "act": "lrelu"}
        self.blocks = nn.ModuleList(
            [TDBlock(f(i), f(i - 1), num_channels, **ls)
             for i in range(R - 1, 1, -1)]
            + [TDLastBlock(f(1), f(0), num_channels, **ls)])
        self.linear = nn.Linear(f(0), 1)
        self.depth, self.alpha = 0, 1.0

    def forward(self, x):
        h = self.blocks[-(self.depth + 1)](x, True)
        if self.depth > 0:
            h = F.avg_pool2d(h, 2)
            if self.alpha < 1.0:
                prev = self.blocks[-self.depth].fromRGB(F.avg_pool2d(x, 2))
                h = h * self.alpha + (1 - self.alpha) * prev
        for i in range(self.depth, 0, -1):
            h = self.blocks[-i](h)
            if i > 1:
                h = F.avg_pool2d(h, 2)
        return self.linear(h.squeeze(-1).squeeze(-1))


# ---------------------------------------------------------------------------
# Weight transplant (ours HWIO -> torch OIHW)
# ---------------------------------------------------------------------------

def _load_conv(tconv: TPGConv, p: dict):
    w = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1)).copy()
    tconv.conv.weight.data = torch.from_numpy(w)
    tconv.conv.bias.data = torch.from_numpy(np.asarray(p["b"]).copy())


def make_torch_G(G: Generator, params: dict) -> TGenerator:
    tg = TGenerator((2, G.num_channels) + (4 * 2 ** G.max_depth,) * 2,
                    G.fmap_base, G.fmap_max, G.latent_size)
    for name in ("c1", "c2", "torgb"):
        _load_conv(getattr(tg.block0, {"torgb": "toRGB"}.get(name, name)),
                   params["block0"][name])
    for tb, pb in zip(tg.blocks, params["blocks"]):
        for name in ("c1", "c2", "torgb"):
            _load_conv(getattr(tb, {"torgb": "toRGB"}.get(name, name)),
                       pb[name])
    return tg.eval()


def make_torch_D(D: Discriminator, params: dict) -> TDiscriminator:
    td = TDiscriminator((2, D.num_channels) + (4 * 2 ** D.max_depth,) * 2,
                        D.fmap_base, D.fmap_max)
    for tb, pb in zip(td.blocks, params["blocks"]):
        for name in ("fromrgb", "c1", "c2"):
            _load_conv(getattr(tb, {"fromrgb": "fromRGB"}.get(name, name)),
                       pb[name])
    td.linear.weight.data = torch.from_numpy(
        np.asarray(params["linear"]["w"]).T.copy())
    td.linear.bias.data = torch.from_numpy(
        np.asarray(params["linear"]["b"]).copy())
    return td.eval()


def to_nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------

SHAPE_A = (4, 3, 64, 64)  # R=6: depths 0..4, no Pallas span (res < 128)
CFG_A = dict(fmap_base=256, fmap_max=64)


@pytest.mark.parametrize("fused_scale", [True, False])
def test_generator_full_network_matches_torch(fused_scale):
    G = Generator(SHAPE_A, latent_size=32, fused_scale=fused_scale, **CFG_A)
    params = G.init(jax.random.PRNGKey(0))
    tg = make_torch_G(G, params)
    z = np.random.RandomState(1).randn(2, 32).astype(np.float32)
    tz = torch.from_numpy(z)
    for depth in range(G.max_depth + 1):
        for alpha in (0.0, 0.3, 1.0):
            tg.depth, tg.alpha = depth, alpha
            with torch.no_grad():
                want = to_nhwc(tg(tz).numpy())
            for fade in ({True} if alpha < 1.0 else {True, False}):
                got = np.asarray(jax.jit(
                    lambda p, zz, d=depth, a=alpha, f=fade:
                    G.apply(p, zz, d, a, fade=f))(params, jnp.asarray(z)))
                np.testing.assert_allclose(
                    got, want, rtol=2e-3, atol=2e-4,
                    err_msg=f"G depth={depth} alpha={alpha} fade={fade} "
                            f"fused_scale={fused_scale}")


@pytest.mark.parametrize("fused_scale", [True, False])
def test_discriminator_full_network_matches_torch(fused_scale):
    D = Discriminator(SHAPE_A, fused_scale=fused_scale, **CFG_A)
    params = D.init(jax.random.PRNGKey(2))
    td = make_torch_D(D, params)
    rng = np.random.RandomState(3)
    for depth in range(D.max_depth + 1):
        res = 4 * 2 ** depth
        x = rng.randn(3, res, res, 3).astype(np.float32)
        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
        for alpha in (0.0, 0.3, 1.0):
            td.depth, td.alpha = depth, alpha
            with torch.no_grad():
                want = td(tx).numpy()
            for fade in ({True} if alpha < 1.0 else {True, False}):
                got = np.asarray(jax.jit(
                    lambda p, xx, d=depth, a=alpha, f=fade:
                    D.apply(p, xx, d, a, fade=f))(params, jnp.asarray(x)))
                np.testing.assert_allclose(
                    got, want, rtol=2e-3, atol=2e-4,
                    err_msg=f"D depth={depth} alpha={alpha} fade={fade} "
                            f"fused_scale={fused_scale}")


SHAPE_B = (8, 3, 128, 128)  # Pallas span engaged at depth 5
CFG_B = dict(fmap_base=512, fmap_max=32, latent_size=16)


def test_full_network_pallas_span_matches_torch():
    """Same transplant comparison with the spatial-lanes Pallas path (fused
    in-kernel epilogues included) actually engaged."""
    G = Generator(SHAPE_B, **CFG_B)
    D = Discriminator(SHAPE_B, fmap_base=512, fmap_max=32)
    assert G._pallas_tail_start(5) is not None
    assert D._pallas_span(5) >= 1
    gp = G.init(jax.random.PRNGKey(4))
    dp = D.init(jax.random.PRNGKey(5))
    tg, td = make_torch_G(G, gp), make_torch_D(D, dp)
    rng = np.random.RandomState(6)
    z = rng.randn(2, 16).astype(np.float32)
    x = rng.randn(2, 128, 128, 3).astype(np.float32)
    tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    for alpha in (0.3, 1.0):
        tg.depth = td.depth = 5
        tg.alpha = td.alpha = alpha
        with torch.no_grad():
            want_g = to_nhwc(tg(torch.from_numpy(z)).numpy())
            want_d = td(tx).numpy()
        got_g = np.asarray(jax.jit(
            lambda p, zz, a=alpha: G.apply(p, zz, 5, a))(gp, jnp.asarray(z)))
        got_d = np.asarray(jax.jit(
            lambda p, xx, a=alpha: D.apply(p, xx, 5, a))(dp, jnp.asarray(x)))
        np.testing.assert_allclose(got_g, want_g, rtol=2e-3, atol=3e-4,
                                   err_msg=f"G pallas alpha={alpha}")
        np.testing.assert_allclose(got_d, want_d, rtol=2e-3, atol=3e-4,
                                   err_msg=f"D pallas alpha={alpha}")


def test_d_loss_scalar_matches_torch():
    """The full D objective (wgan_gp_loss.py:36-65) on the full networks:
    same weights, same fake batch, same mixing factors — the reference's
    (N,1)+(N,) broadcast in the final sum is mean-equivalent to our
    ravel()ed form, so the scalars must agree."""
    depth, alpha = 2, 0.7
    G = Generator(SHAPE_A, latent_size=32, **CFG_A)
    D = Discriminator(SHAPE_A, **CFG_A)
    gp_, dp_ = G.init(jax.random.PRNGKey(7)), D.init(jax.random.PRNGKey(8))
    tg, td = make_torch_G(G, gp_), make_torch_D(D, dp_)
    tg.depth = td.depth = depth
    tg.alpha = td.alpha = alpha
    rng = np.random.RandomState(9)
    res = 4 * 2 ** depth
    real = rng.randn(4, res, res, 3).astype(np.float32)
    z = rng.randn(4, 32).astype(np.float32)
    mix = rng.rand(4).astype(np.float32)
    lam, ieps, target = 10.0, 0.001, 1.0

    # --- torch (reference wgan_gp_loss.py:36-65 verbatim, modern API)
    treal = torch.from_numpy(np.transpose(real, (0, 3, 1, 2)).copy())
    with torch.no_grad():
        tfake = tg(torch.from_numpy(z))
    d_real = td(treal)
    d_real_loss = -d_real + d_real ** 2 * ieps
    d_fake_loss = td(tfake)
    tmix = torch.from_numpy(mix).view(-1, 1, 1, 1)
    mixed = (treal * (1 - tmix) + tfake * tmix).requires_grad_(True)
    scores = td(mixed)
    grads = torch.autograd.grad(scores.sum(), mixed, create_graph=True)[0]
    gnorm = grads.reshape(grads.shape[0], -1).norm(2, dim=1)
    gp_pen = ((gnorm - target) ** 2) * lam / target ** 2
    want = float((d_fake_loss + d_real_loss + gp_pen).mean().detach())

    # --- ours, same mix (losses.py composes identically modulo ravel)
    d_apply = lambda p, xx: D.apply(p, xx, depth, alpha)  # noqa: E731
    fake = jax.lax.stop_gradient(G.apply(gp_, jnp.asarray(z), depth, alpha))
    d_real_j = d_apply(dp_, jnp.asarray(real))
    d_real_loss_j = -d_real_j + jnp.square(d_real_j) * ieps
    d_fake_loss_j = d_apply(dp_, fake)
    pen = calc_gradient_penalty(d_apply, dp_, jnp.asarray(real), fake,
                                jnp.asarray(mix), lam, target)
    got = float(jnp.mean(d_fake_loss_j.ravel() + d_real_loss_j.ravel()
                         + pen))
    assert got == pytest.approx(want, rel=2e-3, abs=2e-3)
