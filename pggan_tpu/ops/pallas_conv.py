"""Pallas spatial-lanes 3x3 convolution for small channel counts.

Why: at the progressive pyramid's high-resolution tail (1024px, 3-32
channels) XLA's conv path leaves ~12x on the table — profiles show the
1024px step 93% HBM-bound with a third of the time in layout copies, because
channels-last tensors with C << 128 waste the (8, 128) tile lanes
(BASELINE.md). This kernel flips the layout: it operates on **NCHW** blocks
so W sits in the lanes (full 128-lane utilization at any C), DMAs one
(C, TH+8, W+128) halo slab per grid step from HBM (slab sizes are
8x128-aligned as Mosaic requires; the over-fetch is the alignment tax),
builds a (9C, TH*W) shifted-window matrix in VMEM, and does one MXU dot
``(K, 9C) @ (9C, TH*W)`` whose result IS the output tile — ~one read of x
plus one write of y: the bandwidth floor.

Status: f32, same-padding 3x3, W a multiple of 128, H a multiple of 8.
``conv3x3`` is fully differentiable (custom VJP: dx reuses this kernel with
flipped/io-swapped weights, dw uses XLA's dw-conv path). Round-1 measured
result on TPU v5e: bit-accurate vs ``lax.conv_general_dilated`` and 2.1x
faster steady-state at the profiled worst layer (3x16x1024x1024 -> 16ch).
Model integration (keeping the high-res stages NCHW end-to-end) is the
round-2 step. Correctness pinned in tests (interpret mode on CPU; compiled
A/B via scripts/bench_pallas_conv.py).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _default_interpret() -> bool:
    # CPU test runs set PGGAN_PALLAS_INTERPRET=1 (tests/conftest.py)
    return os.environ.get("PGGAN_PALLAS_INTERPRET") == "1"


def _kernel(x_hbm, wt_ref, y_ref, slab, sem, *, C, K, TH, W):
    n = pl.program_id(0)
    t = pl.program_id(1)
    # fetch rows [t*TH, t*TH + TH + 8) of the padded input: covers the
    # [t*TH, t*TH + TH + 2) halo window with an 8-row alignment over-fetch
    dma = pltpu.make_async_copy(
        x_hbm.at[n, :, pl.ds(t * TH, TH + 8), :], slab, sem)
    dma.start()
    dma.wait()

    # Per output row: nine accumulated MXU dots, one per 3x3 tap — all
    # operands are plain 2D slices. (Mosaic supports neither the
    # (C, TH, W) -> (C, TH*W) sublane/lane-merging reshape nor concatenation
    # of slices with differing lane offsets, so the im2col formulation is
    # expressed as a tap-sum instead.)
    for r in range(TH):
        acc = jnp.zeros((K, W), jnp.float32)
        for i, (u, v) in enumerate((u, v) for u in range(3)
                                   for v in range(3)):
            acc = acc + jnp.dot(wt_ref[i], slab[:, r + u, v:v + W],
                                preferred_element_type=jnp.float32)
        y_ref[0, :, r, :] = acc


def _pick_th(h: int) -> int:
    for cand in (16, 8):
        if h % cand == 0:
            return cand
    return h


def supported(x_nchw_shape, w_shape) -> bool:
    n, c, h, w = x_nchw_shape
    kh, kw, wc, k = w_shape
    return (kh, kw) == (3, 3) and wc == c and w % 128 == 0 and h % 8 == 0


def conv3x3_small_c(x_nchw: jax.Array, w_hwio: jax.Array,
                    interpret: bool | None = None) -> jax.Array:
    """Same-padding 3x3 conv, NCHW in / NCHW out (spatial-lanes Pallas).

    x: (N, C, H, W) float32 with W % 128 == 0; w: (3, 3, C, K) float32
    (HWIO, already scaled by any equalized-LR constant). Returns (N, K, H, W).
    """
    if interpret is None:
        interpret = _default_interpret()
    n, c, h, w_dim = x_nchw.shape
    assert supported(x_nchw.shape, w_hwio.shape), \
        (x_nchw.shape, w_hwio.shape)
    k = w_hwio.shape[-1]
    th = _pick_th(h)
    # zero-pad: 1 top + 7 bottom rows (alignment over-fetch), 1 left +
    # 127 right columns (lane alignment)
    xp = jnp.pad(x_nchw, ((0, 0), (0, 0), (1, 7), (1, 127)))
    wt = w_hwio.reshape(9, c, k).transpose(0, 2, 1)  # (9, K, C) per-tap

    y = pl.pallas_call(
        partial(_kernel, C=c, K=k, TH=th, W=w_dim),
        out_shape=jax.ShapeDtypeStruct((n, k, h, w_dim), jnp.float32),
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # whole padded x in HBM
            pl.BlockSpec((9, k, c), lambda n_, t_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, th, w_dim),
                               lambda n_, t_: (n_, 0, t_, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((c, th + 8, w_dim + 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, wt)
    return y


# ---------------------------------------------------------------------------
# Differentiable wrapper
# ---------------------------------------------------------------------------
# dx is the same spatial-lanes kernel run on the cotangent with the spatially
# flipped, io-swapped weights; dw (tiny output, huge contraction) goes through
# XLA's dedicated dw-conv path, which is efficient in that regime.

@jax.custom_vjp
def conv3x3(x_nchw: jax.Array, w_hwio: jax.Array) -> jax.Array:
    """Differentiable same-padding 3x3 conv (NCHW), Pallas forward/dx."""
    return conv3x3_small_c(x_nchw, w_hwio)


def _conv3x3_fwd(x, w):
    return conv3x3_small_c(x, w), (x, w)


def _lax_conv(x_nchw, w):
    return jax.lax.conv_general_dilated(
        x_nchw, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "HWIO", "NCHW"))


def _conv3x3_bwd(res, g):
    x, w = res
    w_flip = w[::-1, ::-1].transpose(0, 1, 3, 2)  # flip taps, swap in/out
    # dx via the custom op itself (not the raw pallas_call) so the backward
    # is differentiable again — WGAN-GP's grad-of-grad differentiates this
    # function when the critic's input-gradient is part of the loss.
    dx = conv3x3(g, w_flip)
    _, dw_vjp = jax.vjp(lambda w_: _lax_conv(x, w_), w)
    (dw,) = dw_vjp(g)
    return dx, dw


conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)


# ---------------------------------------------------------------------------
# Higher-order-differentiable wrapper (for WGAN-GP's grad-of-grad)
# ---------------------------------------------------------------------------
# ``conv3x3``'s custom_vjp computes dx with the Pallas kernel — fastest, but
# custom_vjp residual graphs leak a raw pallas_call that reverse-over-reverse
# (the gradient penalty) cannot differentiate. ``conv3x3_ho`` instead defines
# a custom_jvp whose primal is the Pallas kernel (re-wrapped, so arbitrarily
# nested traces keep hitting this rule) while all tangents go through lax
# convs — transposable and differentiable to any order. Net effect: fast
# Pallas forward, XLA derivatives, valid under grad-of-grad.

@jax.custom_jvp
def conv3x3_ho(x_nchw: jax.Array, w_hwio: jax.Array) -> jax.Array:
    """Same-padding 3x3 conv (NCHW): Pallas forward, lax derivatives of any
    order (safe inside the WGAN-GP double backward)."""
    return conv3x3_small_c(x_nchw, w_hwio)


def _conv3x3_ho_jvp(primals, tangents):
    # All tangents via lax: transposable and differentiable to any order.
    # (A Pallas dx here needs a full custom primitive with jvp+transpose
    # rules — jax.custom_derivatives.linear_call cannot carry the residual
    # (weight) tangents the WGAN-GP outer grad requires. Round-2 item.)
    x, w = primals
    tx, tw = tangents
    y = conv3x3_ho(x, w)  # stays wrapped under nested traces
    ty = jnp.zeros_like(y)
    if not isinstance(tx, jax.custom_derivatives.SymbolicZero):
        ty = ty + _lax_conv(tx, w)
    if not isinstance(tw, jax.custom_derivatives.SymbolicZero):
        ty = ty + _lax_conv(x, tw)
    return y, ty


conv3x3_ho.defjvp(_conv3x3_ho_jvp, symbolic_zeros=True)
