"""Forward-only fused conv3x3 -> conv3x3 Pallas chain for the serving path.

Why: the round-3 bound-closure probes (BASELINE.md) showed the spatial-lanes
conv kernels DMA-bound at the practical ~590-600 GiB/s HBM rate with ~2x of
MXU headroom that cannot be spent — the remaining traffic lever at the
high-res tail is to stop round-tripping the INTERMEDIATE activation between
a G block's two convs through HBM. That fusion was rejected for TRAINING
(each fused pair would need its own any-order-AD closure with in-kernel
recompute under WGAN-GP's reverse-over-reverse), but the serving path
(sampling.py, scripts/bench_generate.py, the reference's generate.py:18-30
use case) needs no AD at all — this kernel is that forward-only fusion
(VERDICT r4 next #5).

Per grid tile of TH final-output rows, the kernel:

  1. DMAs a (TH+4)-row halo slab of x straight from the unpadded HBM input
     (double-buffered, same idiom as ops/pallas_conv.py, but with a 2-row
     halo: conv-of-conv needs 2 input rows beyond the output tile each way),
  2. computes the TH+2 intermediate rows ``pn(lrelu(conv(x, w1) + b1))``
     into a VMEM scratch — never touching HBM — zeroing the out-of-image
     halo rows/columns so the second conv sees exact same-padding semantics,
  3. computes the TH output rows ``pn(lrelu(conv(z, w2) + b2))`` from the
     scratch and DMAs only those to HBM.

Traffic: one read of x + one write of y; the intermediate's full-tensor HBM
write + read (the larger of the two tensors' worth of bytes at the 1024px
stage) is eliminated.

Forward-only by construction: raw pallas_calls carry no AD rules, so a grad
through this path fails loudly rather than silently falling back. Training
keeps the per-conv any-order-AD primitives (ops/pallas_conv.py).

Status: f32, same-padding 3x3 pairs, W % 128 == 0, H % 8 == 0, C/K1/K2
% 8 == 0 for the compiled Mosaic kernel (interpret mode emulates any C).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pggan_tpu.ops.pallas_conv import (
    _default_interpret,
    _weights_3k3c,
)


def _fetch_halo2_slab(x_hbm, slab, sem, n, t, *, N, T, TH, H, W):
    """DMA the 2-row-halo window [t*TH - 2, t*TH + TH + 2) of image ``n``
    (layout N, H, C, W) into ``slab`` so that slab row ``s`` holds global
    row ``t*TH - 2 + s``; double-buffered exactly like pallas_conv.py's
    1-row-halo variant (see its docstring for the idiom). Out-of-image rows
    (0-1 at the top edge, TH+2..TH+3 at the bottom) are zeroed; the halo
    columns stay zero from the one-time full-slab zero at grid step 0."""
    def emit(slot, n_, t_, action):
        def dma(src_lo, rows, dst_lo):
            d = pltpu.make_async_copy(
                x_hbm.at[n_, pl.ds(src_lo, rows), :, :],
                slab.at[slot, pl.ds(dst_lo, rows), :, pl.ds(128, W)],
                sem.at[slot])
            getattr(d, action)()

        if T == 1:
            dma(0, H, 2)
        else:
            @pl.when(t_ == 0)
            def _():
                dma(0, TH + 2, 2)

            if T > 2:
                @pl.when(jnp.logical_and(t_ > 0, t_ < T - 1))
                def _():
                    dma(t_ * TH - 2, TH + 4, 0)

            @pl.when(t_ == T - 1)
            def _():
                dma((T - 1) * TH - 2, TH + 2, 0)

    g = n * T + t
    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        slab[...] = jnp.zeros_like(slab)
        emit(0, 0, 0, "start")

    emit(slot, n, t, "wait")

    if N * T > 1:
        @pl.when(g + 1 < N * T)
        def _():
            last_t = t == T - 1
            emit(1 - slot, jnp.where(last_t, n + 1, n),
                 jnp.where(last_t, 0, t + 1), "start")

    @pl.when(t == 0)
    def _():
        slab[slot, 0:2] = jnp.zeros_like(slab[slot, 0:2])

    @pl.when(t == T - 1)
    def _():
        slab[slot, TH + 2:TH + 4] = jnp.zeros_like(slab[slot, TH + 2:TH + 4])

    return slot


def _row_conv(src, row0, wt, *, CIN, W, has_bias, b_ref, slope, pn_eps,
              merged):
    """One output row of a 3x3 conv read from a (rows, CIN, W+256) VMEM
    ref whose column 128+j holds data column j: three accumulated MXU dots
    (K, 3CIN) @ (3CIN, W) over the lane shifts (nine thin dots when CIN is
    not tile-aligned), plus the bias/lrelu/pixelnorm epilogue."""
    acc = None
    for v in range(3):
        if merged:
            ops = src[row0:row0 + 3, :, 127 + v:127 + v + W].reshape(-1, W)
            term = jnp.dot(wt[v], ops, preferred_element_type=jnp.float32)
        else:
            term = None
            for u in range(3):
                t = jnp.dot(wt[v, :, u * CIN:(u + 1) * CIN],
                            src[row0 + u, :, 127 + v:127 + v + W],
                            preferred_element_type=jnp.float32)
                term = t if term is None else term + t
        acc = term if acc is None else acc + term
    if has_bias:
        acc = acc + b_ref[:]
    if slope is not None:
        acc = jnp.where(acc >= 0, acc, acc * slope)
    if pn_eps is not None:
        acc = acc * jax.lax.rsqrt(
            jnp.mean(acc * acc, axis=0, keepdims=True) + pn_eps)
    return acc


def _chain_kernel(x_hbm, wt1_ref, b1_ref, wt2_ref, b2_ref, y_ref, slab, sem,
                  inter, *, C, K1, K2, TH, W, H, N, slope, pn_eps):
    n = pl.program_id(0)
    t = pl.program_id(1)
    T = H // TH
    slot = _fetch_halo2_slab(x_hbm, slab, sem, n, t,
                             N=N, T=T, TH=TH, H=H, W=W)

    @pl.when(n * T + t == 0)
    def _():
        # the intermediate's halo columns (127 and 128+W) must read as the
        # second conv's zero padding; they are never written after this
        inter[...] = jnp.zeros_like(inter)

    # stage 1: intermediate rows. Local row s holds global intermediate row
    # t*TH - 1 + s, computed from slab rows s..s+2 (global x rows
    # t*TH - 2 + s ..). Epilogue applied in-register before the VMEM store.
    m1 = C % 8 == 0
    for s in range(TH + 2):
        z = _row_conv(slab[slot], s, wt1_ref, CIN=C, W=W, has_bias=True,
                      b_ref=b1_ref, slope=slope, pn_eps=pn_eps, merged=m1)
        inter[s, :, 128:128 + W] = z
    # out-of-image intermediate rows are the second conv's ZERO padding —
    # not epilogue(conv(0)) (bias+lrelu of a zero conv is nonzero)
    @pl.when(t == 0)
    def _():
        inter[0:1, :, 128:128 + W] = jnp.zeros((1, K1, W), jnp.float32)

    @pl.when(t == T - 1)
    def _():
        inter[TH + 1:TH + 2, :, 128:128 + W] = jnp.zeros((1, K1, W),
                                                         jnp.float32)

    # stage 2: output rows from the VMEM intermediate (never touches HBM)
    m2 = K1 % 8 == 0
    for r in range(TH):
        y_ref[0, r] = _row_conv(inter, r, wt2_ref, CIN=K1, W=W,
                                has_bias=True, b_ref=b2_ref, slope=slope,
                                pn_eps=pn_eps, merged=m2)


def _pick_th_chain(h, c, k1, k2, w) -> int:
    """Largest row tile whose double-buffered x slab + intermediate scratch
    + output blocks fit the scoped-VMEM budget (cf. pallas_conv._pick_th)."""
    for cand in (64, 32, 16, 8):
        if h % cand:
            continue
        slab = 2 * (cand + 4) * c * (w + 256) * 4
        inter = (cand + 2) * k1 * (w + 256) * 4
        io = 2 * cand * k2 * w * 4
        if slab + inter + io <= 12 * 1024 * 1024:
            return cand
    return h


def chain_supported(x_nhcw_shape, w1_shape, w2_shape) -> bool:
    """Can the COMPILED Mosaic chain kernel run this shape pair?"""
    n, h, c, w = x_nhcw_shape
    k1, k2 = w1_shape[3], w2_shape[3]
    return (w1_shape[:3] == (3, 3, c) and w2_shape[:3] == (3, 3, k1)
            and w % 128 == 0 and h % 8 == 0
            and c % 8 == 0 and k1 % 8 == 0 and k2 % 8 == 0)


def conv3x3_chain(x_nhcw: jax.Array,
                  w1_hwio: jax.Array, b1: jax.Array,
                  w2_hwio: jax.Array, b2: jax.Array,
                  *, slope: float, pn_eps: float | None,
                  interpret: bool | None = None,
                  th: int | None = None) -> jax.Array:
    """Fused ``ep(conv3x3(ep(conv3x3(x, w1) + b1), w2) + b2)`` where ``ep``
    is leaky-relu(slope) followed by optional pixelnorm — one kernel, the
    intermediate never leaves VMEM. FORWARD-ONLY (no AD rules; see module).

    x: (N, H, C, W) f32, w1: (3, 3, C, K1), w2: (3, 3, K1, K2) (HWIO,
    already equalized-LR scaled); returns (N, H, K2, W) f32.
    """
    if interpret is None:
        interpret = _default_interpret()
    n, h, c, w_dim = x_nhcw.shape
    assert interpret or chain_supported(x_nhcw.shape, w1_hwio.shape,
                                        w2_hwio.shape), \
        (x_nhcw.shape, w1_hwio.shape, w2_hwio.shape)
    assert w1_hwio.shape[:3] == (3, 3, c) and \
        w2_hwio.shape[:3] == (3, 3, w1_hwio.shape[3])
    k1, k2 = w1_hwio.shape[3], w2_hwio.shape[3]
    assert b1.shape == (k1,) and b2.shape == (k2,), (b1.shape, b2.shape)
    th = th or _pick_th_chain(h, c, k1, k2, w_dim)

    return pl.pallas_call(
        partial(_chain_kernel, C=c, K1=k1, K2=k2, TH=th, W=w_dim, H=h, N=n,
                slope=float(slope),
                pn_eps=None if pn_eps is None else float(pn_eps)),
        out_shape=jax.ShapeDtypeStruct((n, h, k2, w_dim), jnp.float32),
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # whole (unpadded) x in HBM
            pl.BlockSpec((3, k1, 3 * c), lambda n_, t_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k1, 1), lambda n_, t_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, k2, 3 * k1), lambda n_, t_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k2, 1), lambda n_, t_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, k2, w_dim),
                               lambda n_, t_: (n_, t_, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, th + 4, c, w_dim + 256), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((th + 2, k1, w_dim + 256), jnp.float32),
        ],
        interpret=interpret,
    )(x_nhcw, _weights_3k3c(w1_hwio), b1.reshape(k1, 1),
      _weights_3k3c(w2_hwio), b2.reshape(k2, 1))
