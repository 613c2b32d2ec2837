"""Pallas spatial-lanes 3x3 convolution for small channel counts.

Why: at the progressive pyramid's high-resolution tail (1024px, 3-32
channels) XLA's conv path leaves ~12x on the table — profiles show the
1024px step 93% HBM-bound with a third of the time in layout copies, because
channels-last tensors with C << 128 waste the (8, 128) tile lanes
(BASELINE.md). This kernel flips the layout: it operates on **NCHW** blocks
so W sits in the lanes (full 128-lane utilization at any C), DMAs one
(C, TH+8, W+128) halo slab per grid step from HBM (slab sizes are
8x128-aligned as Mosaic requires; the over-fetch is the alignment tax),
builds the 3x3 window as nine shifted slices in VMEM, and does nine
accumulated MXU dots ``(K, C) @ (C, W)`` per output row whose result IS the
output tile — ~one read of x plus one write of y: the bandwidth floor.

Differentiation: ``conv3x3`` is a first-class JAX primitive with bilinear
JVP and transpose rules (``ad.defbilinear``), so it is differentiable to
ANY order — including WGAN-GP's reverse-over-reverse (the gradient penalty
differentiates the critic's input-gradient, reference wgan_gp_loss.py:25-28).
The input-cotangent transpose is the same spatial-lanes kernel applied to
the cotangent with tap-flipped, io-swapped weights (so dx and ddx run on
Pallas too); the weight-cotangent is XLA's dedicated dw-conv formulation
(tiny output, huge contraction — the regime XLA already handles well).

Status: f32, same-padding 3x3, W a multiple of 128, H a multiple of 8.
Round-1 measured result on TPU v5e: bit-accurate vs
``lax.conv_general_dilated`` and 2.1x faster steady-state at the profiled
worst layer (3x16x1024x1024 -> 16ch); the full NCHW D-entry chain
(fwd+bwd) 1.75x over the NHWC/XLA chain. Correctness pinned in tests
(interpret mode on CPU; compiled A/B via scripts/bench_pallas_conv.py).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.extend import core as jex_core
from jax.interpreters import ad, batching, mlir


def _default_interpret() -> bool:
    # CPU test runs set PGGAN_PALLAS_INTERPRET=1 (tests/conftest.py); the
    # multi-chip dryrun and any other host-platform run are caught by the
    # backend check (compiled Mosaic kernels only exist on TPU).
    if os.environ.get("PGGAN_PALLAS_INTERPRET") == "1":
        return True
    try:
        return jax.default_backend() != "tpu"
    except Exception:  # backend not initialisable: stay conservative
        return True


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
            pl.BlockSpec(memory_space=pl.ANY),  # whole padded x in HBM
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
# The conv3x3 primitive: differentiable to any order, Pallas everywhere the
# FLOPs are.
# ---------------------------------------------------------------------------
# The op is bilinear in (x, w), so jvp + transpose rules close it under
# arbitrarily nested forward/reverse AD (``ad.defbilinear``):
#   - tangents:     conv(tx, w) and conv(x, tw)   -> this primitive (Pallas)
#   - x-cotangent:  conv(ct, flip_io(w))          -> this primitive (Pallas)
#   - w-cotangent:  XLA dw-conv (batch contracted as the conv's feature dim)
# This is what round 1's custom_vjp/custom_jvp wrappers could not provide:
# the VJP residuals leaked raw pallas_calls that reverse-over-reverse (the
# WGAN-GP gradient penalty) could not differentiate, forcing lax derivatives.

conv3x3_p = jex_core.Primitive("pggan_conv3x3")


def conv3x3(x_nchw: jax.Array, w_hwio: jax.Array) -> jax.Array:
    """Differentiable (any order) same-padding 3x3 conv, NCHW, Pallas."""
    return conv3x3_p.bind(x_nchw, w_hwio)


def _conv3x3_abstract(x, w):
    assert supported(x.shape, w.shape), (x.shape, w.shape)
    n, c, h, wd = x.shape
    return jax.core.ShapedArray((n, w.shape[-1], h, wd), x.dtype)


def _flip_io(w_hwio: jax.Array) -> jax.Array:
    """Spatially flipped, in/out-swapped weights: the conv-transpose kernel."""
    return w_hwio[::-1, ::-1].transpose(0, 1, 3, 2)


def _dx_transpose(ct, _x_undef, w):
    # d/dx: same-padding conv of the cotangent with the flipped kernel —
    # stays on the spatial-lanes Pallas kernel (this is the hot per-pixel
    # gradient both in the D backward and in the GP's grad-of-grad).
    return conv3x3(ct, _flip_io(w))


def _dw_transpose(ct, x, _w_undef):
    # d/dw[u,v,c,k] = sum_{n,i,j} xpad[n,c,i+u-1,j+v-1] * ct[n,k,i,j]:
    # a conv contracting the sample axis as "features" — lhs x:(N,C,H,W)
    # read as (feature=N, batch=C), rhs ct:(N,K,H,W) as (I=N, O=K), output
    # (H'=3, W'=3, batch=C, feature=K) = HWIO. XLA's dw-conv path handles
    # this tiny-output/huge-contraction regime well; no Pallas needed.
    return jax.lax.conv_general_dilated(
        x, ct, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("CNHW", "IOHW", "HWNC"),
        preferred_element_type=jnp.float32)


def _conv3x3_batch(args, dims):
    x, w = args
    bx, bw = dims
    if bw is not None:
        raise NotImplementedError("vmap over conv3x3 weights")
    x = jnp.moveaxis(x, bx, 0)
    b, n = x.shape[:2]
    y = conv3x3(x.reshape((b * n,) + x.shape[2:]), w)
    return y.reshape((b, n) + y.shape[1:]), 0


conv3x3_p.def_abstract_eval(_conv3x3_abstract)
conv3x3_p.def_impl(lambda x, w: conv3x3_small_c(x, w))
mlir.register_lowering(
    conv3x3_p,
    mlir.lower_fun(lambda x, w: conv3x3_small_c(x, w),
                   multiple_results=False))
ad.defbilinear(conv3x3_p, _dx_transpose, _dw_transpose)
batching.primitive_batchers[conv3x3_p] = _conv3x3_batch


def _lax_conv(x_nchw, w):
    """Reference NCHW conv (tests + the dw formulation's parity checks)."""
    return jax.lax.conv_general_dilated(
        x_nchw, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "HWIO", "NCHW"))
