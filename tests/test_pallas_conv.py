"""Spatial-lanes Pallas 3x3 conv vs lax.conv (interpret mode on CPU; the
compiled kernels are re-validated on TPU per change — fwd bit-accurate at
the (3,1024,16,1024) NHCW config, see BASELINE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pggan_tpu.ops.pallas_conv import (
    _dw_einsum,
    conv3x3_dw_small_c,
    conv3x3_small_c,
    supported,
)


def reference(x_nhcw, w):
    return jax.lax.conv_general_dilated(
        x_nhcw, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHCW", "HWIO", "NHCW"))


# C = 5/3/16/8 covers both compute paths: the merged (K, 3C) @ (3C, W)
# formulation (C % 8 == 0) and the thin per-tap fallback; the C=128 case
# pins the widened-envelope regime (PALLAS_MAX_CIN_HI=128 A/B, BASELINE r4)
@pytest.mark.parametrize("shape,cout", [((2, 32, 5, 128), 7),
                                        ((1, 16, 3, 256), 16),
                                        ((3, 8, 16, 128), 4),
                                        ((2, 24, 8, 128), 12),
                                        ((1, 8, 128, 128), 256)])
def test_matches_lax_conv(shape, cout):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, shape[2], cout).astype(np.float32))
    got = conv3x3_small_c(x, w, interpret=True)
    want = reference(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape,cout", [((2, 32, 8, 128), 16),
                                        ((1, 16, 5, 256), 4)])
def test_dw_kernel_matches_einsum(shape, cout):
    """The dw kernel's one-pass accumulation (merged and thin paths) must
    reproduce the shifted-slice einsum formulation."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    ct = jnp.asarray(rng.randn(shape[0], shape[1], cout,
                               shape[3]).astype(np.float32))
    got = conv3x3_dw_small_c(x, ct, interpret=True)
    want = _dw_einsum(x, ct)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("th,shape,cout", [
    (8, (2, 24, 8, 128), 8),    # T=3, image rollover mid-pipeline
    (8, (1, 16, 8, 128), 16),   # T=2: both edge branches, no middle
    (16, (3, 48, 16, 128), 8),  # T=3 with N=3 rollovers
])
def test_double_buffer_grid_edges(th, shape, cout):
    """The double-buffered halo pipeline must stay correct across block
    boundaries: the wait must pair with the predecessor's start (including
    the cross-image rollover) and the edge zeroing must hit the right
    slot."""
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, shape[2], cout).astype(np.float32))
    got = conv3x3_small_c(x, w, interpret=True, th=th)
    np.testing.assert_allclose(np.asarray(got), np.asarray(reference(x, w)),
                               rtol=1e-4, atol=1e-4)
    ct = jnp.asarray(rng.randn(shape[0], shape[1], cout,
                               shape[3]).astype(np.float32))
    dw = conv3x3_dw_small_c(x, ct, interpret=True, th=th)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(_dw_einsum(x, ct)),
                               rtol=1e-4, atol=1e-3)


def test_supported_predicate():
    assert supported((1, 1024, 16, 1024), (3, 3, 16, 16))
    assert not supported((1, 1024, 16, 100), (3, 3, 16, 16))  # W % 128
    assert not supported((1, 1024, 16, 1024), (5, 5, 16, 16))  # kernel size
    assert not supported((1, 1024, 8, 1024), (3, 3, 16, 16))  # C mismatch
    assert not supported((1, 1024, 12, 1024), (3, 3, 12, 16))  # C % 8
    assert not supported((1, 1024, 16, 1024), (3, 3, 16, 12))  # K % 8


def test_edge_zero_padding_semantics():
    """Borders must see zero padding exactly like lax.conv 'same'."""
    x = jnp.ones((1, 8, 2, 128), jnp.float32)
    w = jnp.ones((3, 3, 2, 1), jnp.float32)
    got = np.asarray(conv3x3_small_c(x, w, interpret=True))[0, :, 0, :]
    want = np.asarray(reference(x, w))[0, :, 0, :]
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert got[0, 0] == pytest.approx(8.0)  # corner: 4 taps x 2 channels
    assert got[4, 64] == pytest.approx(18.0)  # interior: 9 taps x 2 channels


def test_primitive_first_order_matches_lax():
    """d/dx runs on the Pallas kernel (transpose rule), d/dw on the XLA
    dw-conv formulation — both must equal the plain lax conv's grads."""
    import pggan_tpu.ops.pallas_conv as pc
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 8, 128).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32))

    gp = jax.grad(lambda x, w: jnp.sum(jnp.sin(pc.conv3x3(x, w))),
                  argnums=(0, 1))(x, w)
    gr = jax.grad(lambda x, w: jnp.sum(jnp.sin(pc._lax_conv(x, w))),
                  argnums=(0, 1))(x, w)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_primitive_grad_of_grad_matches_lax():
    """The primitive must survive reverse-over-reverse (the WGAN-GP pattern)
    with gradients equal to pure-lax — this is what round 1's custom_vjp
    wrapper could not do without falling back to lax derivatives."""
    import pggan_tpu.ops.pallas_conv as pc
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 128).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32))

    def gp_like(fn, ww):
        gx = jax.grad(lambda xx: jnp.sum(fn(xx, ww)))(x)
        return jnp.sum(jnp.square(gx))

    o1 = jax.grad(lambda w_: gp_like(pc.conv3x3, w_))(w)
    o2 = jax.grad(lambda w_: gp_like(pc._lax_conv, w_))(w)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=1e-4, atol=1e-4)


def test_primitive_third_order_and_vmap():
    import pggan_tpu.ops.pallas_conv as pc
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 8, 8, 128).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32))

    def gp2(conv, ww):
        gx = jax.grad(lambda xx: jnp.sum(jnp.tanh(conv(xx, ww))))(x)
        return jnp.sum(jnp.square(gx))

    o1 = jax.grad(jax.grad(lambda s: gp2(pc.conv3x3, w * s)))(jnp.float32(1.))
    o2 = jax.grad(jax.grad(lambda s: gp2(pc._lax_conv, w * s)))(jnp.float32(1.))
    np.testing.assert_allclose(float(o1), float(o2), rtol=1e-3)

    xv = jnp.asarray(rng.randn(2, 2, 8, 8, 128).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(jax.vmap(lambda xx: pc.conv3x3(xx, w))(xv)),
        np.asarray(jax.vmap(lambda xx: pc._lax_conv(xx, w))(xv)),
        rtol=1e-4, atol=1e-4)


def _epilogue_composed(x, w, b, pn, eps=1e-8):
    y = reference(x, w) + b[None, None, :, None]
    z = jnp.where(y >= 0, y, 0.2 * y)
    if pn:
        z = z * jax.lax.rsqrt(jnp.mean(z * z, axis=2, keepdims=True) + eps)
    return z


@pytest.mark.parametrize("pn", [False, True])
@pytest.mark.parametrize("shape,cout", [((2, 16, 8, 128), 16),
                                        ((1, 24, 16, 256), 8)])
def test_fused_epilogue_matches_composition(pn, shape, cout):
    """The in-kernel epilogue (bias -> lrelu -> optional pixelnorm) must be
    numerically identical to the composed form, incl. first-order grads in
    all three operands."""
    import pggan_tpu.ops.pallas_conv as pc
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, shape[2], cout).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.randn(cout).astype(np.float32))
    fused = ((lambda x, w, b: pc.conv3x3_act_pn(x, w, b, slope=0.2)) if pn
             else (lambda x, w, b: pc.conv3x3_act(x, w, b, slope=0.2)))
    ref = lambda x, w, b: _epilogue_composed(x, w, b, pn)  # noqa: E731
    np.testing.assert_allclose(np.asarray(fused(x, w, b)),
                               np.asarray(ref(x, w, b)),
                               rtol=1e-4, atol=1e-4)
    g1 = jax.grad(lambda *a: jnp.sum(jnp.sin(fused(*a))), (0, 1, 2))(x, w, b)
    g2 = jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a))), (0, 1, 2))(x, w, b)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("pn", [False, True])
def test_fused_epilogue_grad_of_grad(pn):
    """The fused primitives' JVP rules close on themselves: WGAN-GP's
    reverse-over-reverse must match the composed form."""
    import pggan_tpu.ops.pallas_conv as pc
    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.randn(1, 8, 8, 128).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.randn(8).astype(np.float32))
    fused = ((lambda x, w, b: pc.conv3x3_act_pn(x, w, b, slope=0.2)) if pn
             else (lambda x, w, b: pc.conv3x3_act(x, w, b, slope=0.2)))
    ref = lambda x, w, b: _epilogue_composed(x, w, b, pn)  # noqa: E731

    def gp_like(f, ww):
        gx = jax.grad(lambda xx: jnp.sum(f(xx, ww, b)))(x)
        return jnp.sum(jnp.square(gx))

    h1 = jax.grad(lambda w_: gp_like(fused, w_))(w)
    h2 = jax.grad(lambda w_: gp_like(ref, w_))(w)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2),
                               rtol=1e-3, atol=1e-3)
    # third order through a weight scale, plus the bias path under GP
    o1 = jax.grad(jax.grad(lambda s: gp_like(fused, w * s)))(jnp.float32(1.))
    o2 = jax.grad(jax.grad(lambda s: gp_like(ref, w * s)))(jnp.float32(1.))
    np.testing.assert_allclose(float(o1), float(o2), rtol=1e-3)


def test_fused_epilogue_vmap():
    import pggan_tpu.ops.pallas_conv as pc
    rng = np.random.RandomState(13)
    xv = jnp.asarray(rng.randn(2, 1, 8, 8, 128).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.randn(8).astype(np.float32))
    for f in ((lambda xx: pc.conv3x3_act(xx, w, b, slope=0.2)),
              (lambda xx: pc.conv3x3_act_pn(xx, w, b, slope=0.2))):
        np.testing.assert_allclose(
            np.asarray(jax.vmap(f)(xv)),
            np.asarray(jnp.stack([f(xv[i]) for i in range(2)])),
            rtol=1e-4, atol=1e-4)


def test_discriminator_pallas_tail_matches_reference_path():
    """pallas_tail=True must be numerically identical to the NHWC path,
    including full WGAN-GP gradients."""
    from pggan_tpu.losses import wgan_gp_D_loss
    from pggan_tpu.models import Discriminator, Generator

    shape = (8, 3, 128, 128)
    d_p = Discriminator(shape, fmap_base=512, fmap_max=32, pallas_tail=True)
    d_r = Discriminator(shape, fmap_base=512, fmap_max=32, pallas_tail=False)
    g = Generator(shape, latent_size=16, fmap_base=512, fmap_max=32)
    dp, gp = d_p.init(jax.random.PRNGKey(0)), g.init(jax.random.PRNGKey(1))
    assert d_p._pallas_span(5) == 1  # only the 128px entry is lane-aligned
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 128, 128, 3))
    np.testing.assert_allclose(
        np.asarray(jax.jit(lambda p, v: d_p.apply(p, v, 5, 0.4))(dp, x)),
        np.asarray(jax.jit(lambda p, v: d_r.apply(p, v, 5, 0.4))(dp, x)),
        rtol=1e-4, atol=1e-5)

    z = jax.random.normal(jax.random.PRNGKey(3), (2, 16))

    def dloss(model, params):
        c, _ = wgan_gp_D_loss(lambda p, xx: model.apply(p, xx, 5, 0.5),
                              lambda p, zz: g.apply(p, zz, 5, 0.5),
                              params, gp, x, z, jax.random.PRNGKey(4))
        return c

    g1 = jax.jit(jax.grad(lambda p: dloss(d_p, p)))(dp)
    g2 = jax.jit(jax.grad(lambda p: dloss(d_r, p)))(dp)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_generator_pallas_tail_matches_reference_path():
    """The G high-res NHCW tail (explicit upsample + Pallas convs + toRGB +
    blend) must match the fused-scale NHWC path in values (fade and stable)
    and in G-loss gradients (first-order through the frozen D)."""
    from pggan_tpu.losses import wgan_gp_G_loss
    from pggan_tpu.models import Discriminator, Generator

    shape = (8, 3, 128, 128)
    g_p = Generator(shape, latent_size=16, fmap_base=512, fmap_max=32)
    g_r = Generator(shape, latent_size=16, fmap_base=512, fmap_max=32,
                    pallas_tail=False)
    d = Discriminator(shape, fmap_base=512, fmap_max=32, pallas_tail=False)
    gp, dp = g_p.init(jax.random.PRNGKey(0)), d.init(jax.random.PRNGKey(1))
    assert g_p._pallas_tail_start(5) is not None
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 16))
    for fade, alpha in ((True, 0.4), (False, 1.0)):
        np.testing.assert_allclose(
            np.asarray(jax.jit(
                lambda p, zz: g_p.apply(p, zz, 5, alpha, fade))(gp, z)),
            np.asarray(jax.jit(
                lambda p, zz: g_r.apply(p, zz, 5, alpha, fade))(gp, z)),
            # fused-scale vs explicit-upsample reassociate float sums
            rtol=2e-4, atol=1e-4)

    def gloss(model, params):
        return wgan_gp_G_loss(lambda p, zz: model.apply(p, zz, 5, 0.5),
                              lambda p, xx: d.apply(p, xx, 5, 0.5),
                              params, dp, z)

    g1 = jax.jit(jax.grad(lambda p: gloss(g_p, p)))(gp)
    g2 = jax.jit(jax.grad(lambda p: gloss(g_r, p)))(gp)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_multi_stage_span_matches_reference_path():
    """At 256px the head covers entry@256 + DBlock@128 (span 2); values and
    WGAN-GP parameter gradients must match the NHWC path."""
    from pggan_tpu.losses import wgan_gp_D_loss
    from pggan_tpu.models import Discriminator, Generator

    shape = (8, 3, 256, 256)
    d_p = Discriminator(shape, fmap_base=1024, fmap_max=64, pallas_tail=True)
    d_r = Discriminator(shape, fmap_base=1024, fmap_max=64, pallas_tail=False)
    g = Generator(shape, latent_size=16, fmap_base=1024, fmap_max=64)
    dp, gp = d_p.init(jax.random.PRNGKey(0)), g.init(jax.random.PRNGKey(1))
    assert d_p._pallas_span(6) == 2
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 256, 256, 3))
    np.testing.assert_allclose(
        np.asarray(jax.jit(lambda p, v: d_p.apply(p, v, 6, 0.4))(dp, x)),
        np.asarray(jax.jit(lambda p, v: d_r.apply(p, v, 6, 0.4))(dp, x)),
        rtol=1e-4, atol=1e-5)

    z = jax.random.normal(jax.random.PRNGKey(3), (1, 16))

    def dloss(model, params):
        c, _ = wgan_gp_D_loss(lambda p, xx: model.apply(p, xx, 6, 0.5),
                              lambda p, zz: g.apply(p, zz, 6, 0.5),
                              params, gp, x, z, jax.random.PRNGKey(4))
        return c

    g1 = jax.jit(jax.grad(lambda p: dloss(d_p, p)))(dp)
    g2 = jax.jit(jax.grad(lambda p: dloss(d_r, p)))(dp)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        # atol 2e-4: the merged (K, 3C) dot reassociates float sums, and
        # the GP's grad-of-grad chain at 256px amplifies the difference
        # (component-level parity is 5e-6 rel, incl. compiled on TPU)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-4)


def test_sharded_head_matches_unsharded():
    """With a mesh set, the head runs under shard_map over the batch axis
    (pallas_call is opaque to GSPMD); sharded values and full WGAN-GP
    gradients must equal the single-device result."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from pggan_tpu.losses import wgan_gp_D_loss
    from pggan_tpu.models import Discriminator, Generator

    shape = (8, 3, 128, 128)
    d_s = Discriminator(shape, fmap_base=512, fmap_max=32, pallas_tail=True)
    d_1 = Discriminator(shape, fmap_base=512, fmap_max=32, pallas_tail=True)
    g = Generator(shape, latent_size=16, fmap_base=512, fmap_max=32)
    dp, gp = d_s.init(jax.random.PRNGKey(0)), g.init(jax.random.PRNGKey(1))
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    d_s.mesh = mesh
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 128, 128, 3))
    z = jax.random.normal(jax.random.PRNGKey(3), (4, 16))

    def dloss(model, params, xx):
        c, _ = wgan_gp_D_loss(lambda p, v: model.apply(p, v, 5, 0.5),
                              lambda p, zz: g.apply(p, zz, 5, 0.5),
                              params, gp, xx, z, jax.random.PRNGKey(4))
        return c

    grad_s = jax.jit(jax.grad(lambda p, xx: dloss(d_s, p, xx)),
                     in_shardings=(NamedSharding(mesh, P()),
                                   NamedSharding(mesh, P("data"))))
    g1 = grad_s(dp, x)
    g2 = jax.jit(jax.grad(lambda p: dloss(d_1, p, x)))(dp)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        # atol 1e-4: the cross-shard psum reassociates float sums
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
