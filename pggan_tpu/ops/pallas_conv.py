"""Pallas spatial-lanes 3x3 convolution for small channel counts.

Why: at the progressive pyramid's high-resolution tail (1024px, 3-32
channels) XLA's conv path leaves ~12x on the table — profiles show the
1024px step 93% HBM-bound with a third of the time in layout copies, because
channels-last tensors with C << 128 waste the (8, 128) tile lanes
(BASELINE.md). This kernel flips the layout: it operates on **NHCW** blocks
— H major, C in the sublanes, W in the lanes (full 128-lane utilization at
any C). Per grid step it DMAs a (TH+2, C, W) halo slab straight from the
UNPADDED input (the row dimension is major, so edge-clamped DMAs need no
alignment over-fetch and no zero-padded HBM copy), and computes each output
row with three accumulated MXU dots ``(K, 3C) @ (3C, W)`` — the three row
taps of the 3x3 window merge into the contraction via a tile-aligned
(3, C, W) -> (3C, W) value reshape when C % 8 == 0 (nine thin ``(K, C) @
(C, W)`` dots otherwise; measured ~1.4x slower from dot-issue overhead).
Total traffic: ~one read of x plus one write of y — the bandwidth floor.

Differentiation: ``conv3x3`` is a first-class JAX primitive with bilinear
JVP and transpose rules (``ad.defbilinear``), so it is differentiable to
ANY order — including WGAN-GP's reverse-over-reverse (the gradient penalty
differentiates the critic's input-gradient, reference wgan_gp_loss.py:25-28).
The input-cotangent transpose is the same spatial-lanes kernel applied to
the cotangent with tap-flipped, io-swapped weights (so dx and ddx run on
Pallas too); the weight-cotangent is a second bilinear primitive backed by
its own one-pass Pallas kernel (``conv3x3_dw``) whose transposes are convs
of the other operand — the two primitives close on each other under
arbitrarily nested AD.

Status: f32, same-padding 3x3, W a multiple of 128, H a multiple of 8.
Measured on TPU v5e: bit-accurate vs ``lax.conv_general_dilated`` at the
profiled worst layer and 2.1-3x faster steady-state; the depth-8 train
step's HLO self-time drops 360 -> <200 ms/step vs the pure-XLA path
(BASELINE.md). Correctness pinned in tests (interpret mode on CPU;
compiled parity re-checked on TPU per change).
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


def _fetch_halo_slab(x_hbm, slab, sem, n, t, *, N, T, TH, H, W):
    """DMA the halo window rows [t*TH - 1, t*TH + TH + 1) of image ``n``
    (layout N, H, C, W) into ``slab`` so that slab row ``s`` holds global
    row ``t*TH - 1 + s`` and slab column ``128 + j`` holds global column
    ``j`` — entirely from the UNPADDED input. Materializing a zero-padded
    copy in HBM (round 1's approach) reads + writes the whole tensor once
    more per conv call, which profiled at ~5-6% of the depth-8 train step;
    here the halo is assembled in VMEM instead.

    The row dimension is MAJOR in this layout, so edge-clamped DMAs can
    start at any row — no alignment over-fetch (the NCHW variant had to
    fetch 8-aligned slabs, doubling read traffic at TH=16). Sizes must
    still be static, hence the per-edge branches. The out-of-image halo
    rows (0 at the top edge, TH+1 at the bottom) are zeroed; halo columns
    127 and 128+W are never DMA'd and stay zero from the one-time
    full-slab zero at the first grid step.

    Double-buffered: ``slab`` holds TWO slots and each step waits on the
    DMA its predecessor started, then prefetches the NEXT window into the
    other slot before computing — the fetch rides under the MXU work
    instead of serializing with it. Returns the slot index to compute
    from.
    """
    def emit(slot, n_, t_, action):
        """Start or wait the window DMA for grid step (n_, t_) into the
        given slab slot. The wait rebuilds the same descriptor the start
        used (standard Pallas idiom), so the per-edge branch structure must
        match — hence one helper for both actions."""
        def dma(src_lo, rows, dst_lo):
            d = pltpu.make_async_copy(
                x_hbm.at[n_, pl.ds(src_lo, rows), :, :],
                slab.at[slot, pl.ds(dst_lo, rows), :, pl.ds(128, W)],
                sem.at[slot])
            getattr(d, action)()

        if T == 1:
            dma(0, H, 1)
        else:
            @pl.when(t_ == 0)
            def _():
                dma(0, TH + 1, 1)

            if T > 2:
                @pl.when(jnp.logical_and(t_ > 0, t_ < T - 1))
                def _():
                    dma(t_ * TH - 1, TH + 2, 0)

            @pl.when(t_ == T - 1)
            def _():
                dma((T - 1) * TH - 1, TH + 1, 0)

    g = n * T + t
    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        # zero both slots once: the halo columns (127 and 128+W) are never
        # DMA'd and must read as zero-padding for every window
        slab[...] = jnp.zeros_like(slab)
        emit(0, 0, 0, "start")

    emit(slot, n, t, "wait")  # started at the previous step (or just above)

    if N * T > 1:  # double buffering: prefetch the next window over compute
        @pl.when(g + 1 < N * T)
        def _():
            last_t = t == T - 1
            emit(1 - slot, jnp.where(last_t, n + 1, n),
                 jnp.where(last_t, 0, t + 1), "start")

    # zero-pad rows: global row -1 (slab row 0) at the top edge, global row
    # H (slab row TH+1) at the bottom. Middle blocks DMA real data over both.
    @pl.when(t == 0)
    def _():
        slab[slot, 0:1] = jnp.zeros_like(slab[slot, 0:1])

    @pl.when(t == T - 1)
    def _():
        slab[slot, TH + 1:TH + 2] = jnp.zeros_like(slab[slot, TH + 1:TH + 2])

    return slot


def _taps(slab, slot, r, v, *, C, W, merged):
    """The 3x3 window operands for output row ``r``, lane shift ``v``:
    slot rows r..r+3 hold global rows r-1..r+2 of the current block, slab
    column 127+v+j holds global column j + (v-1)."""
    if merged:
        # one (3C, W) operand per lane shift: the three row taps merge into
        # the contraction via a tile-aligned value reshape (C % 8 == 0)
        return slab[slot, r:r + 3, :, 127 + v:127 + v + W].reshape(-1, W)
    return [slab[slot, r + u, :, 127 + v:127 + v + W] for u in range(3)]


def _kernel(*refs, C, K, TH, W, H, N, slope=None, pn_eps=None,
            has_bias=False):
    """Forward kernel, optionally with the layer epilogue fused in VMEM.

    A pallas_call is opaque to XLA fusion, so the reference epilogue
    (bias -> (leaky)ReLU -> pixelnorm, network.py:32-41) after this kernel
    would be a separate full-tensor HBM read+write pass — profiled at ~60%
    of the depth-8 train step (BASELINE.md). With ``has_bias``/``slope``/
    ``pn_eps`` set, the epilogue is applied to the (K, W) accumulator before
    the output DMA instead: bias broadcasts from a (K, 1) VMEM block, the
    activation is one VPU select, and pixelnorm's per-(h, w) channel
    reduction runs over the sublane dim (C lives whole in each block, no
    cross-block communication). The pixelnorm variant emits a second output
    ``r = rsqrt(mean_C(z^2) + eps)`` of shape (N, H, W) — 1/K the activation
    size — which the JVP rule needs to stay closed under any-order AD.
    """
    it = iter(refs)
    x_hbm, wt_ref = next(it), next(it)
    b_ref = next(it) if has_bias else None
    y_ref = next(it)
    r_ref = next(it) if pn_eps is not None else None
    slab, sem = next(it), next(it)

    n = pl.program_id(0)
    t = pl.program_id(1)
    slot = _fetch_halo_slab(x_hbm, slab, sem, n, t,
                            N=N, T=H // TH, TH=TH, H=H, W=W)

    # Per output row: three accumulated MXU dots (K, 3C) @ (3C, W), one per
    # lane shift v, when C is tile-aligned — nine thin (K, C) @ (C, W) dots
    # otherwise (dot-issue overhead measured ~1.4x slower). Mosaic supports
    # neither lane-merging reshapes nor concatenation of slices at differing
    # lane offsets, so the v taps cannot merge further.
    merged = C % 8 == 0
    for r in range(TH):
        acc = jnp.zeros((K, W), jnp.float32)
        for v in range(3):
            ops = _taps(slab, slot, r, v, C=C, W=W, merged=merged)
            if merged:
                acc = acc + jnp.dot(wt_ref[v], ops,
                                    preferred_element_type=jnp.float32)
            else:
                for u in range(3):
                    acc = acc + jnp.dot(wt_ref[v, :, u * C:(u + 1) * C],
                                        ops[u],
                                        preferred_element_type=jnp.float32)
        if has_bias:
            acc = acc + b_ref[:]  # (K, 1) broadcast over lanes
        if slope is not None:
            acc = jnp.where(acc >= 0, acc, acc * slope)
        if pn_eps is not None:
            rrow = jax.lax.rsqrt(
                jnp.mean(acc * acc, axis=0, keepdims=True) + pn_eps)
            y_ref[0, r] = acc * rrow
            r_ref[0, r:r + 1] = rrow
        else:
            y_ref[0, r] = acc


def _pick_th(h: int, c: int, k: int, w: int) -> int:
    """Largest row-tile whose double-buffered slab + io blocks fit the
    ~16 MB scoped-VMEM budget (with headroom): bigger tiles amortize DMA
    issue and loop overhead (~5% at TH=32 vs 16 on the 1024px shapes;
    TH=64 with C=16 exceeds the limit and fails to compile)."""
    for cand in (64, 32, 16, 8):
        if h % cand:
            continue
        slab = 2 * (cand + 2) * c * (w + 256) * 4
        io = 2 * cand * k * w * 4  # out block (fwd) / ct block (dw), 2 slots
        if slab + io <= 12 * 1024 * 1024:
            return cand
    return h


def _shape_ok(x_nhcw_shape, w_shape) -> bool:
    n, h, c, w = x_nhcw_shape
    kh, kw, wc, k = w_shape
    return (kh, kw) == (3, 3) and wc == c and w % 128 == 0 and h % 8 == 0


def supported(x_nhcw_shape, w_shape) -> bool:
    """Can the COMPILED Mosaic kernel run this shape? On top of the
    structural requirements, C and K sit in the (8, 128)-tiled sublane
    dimension in this layout, so DMAs/blocks need them 8-aligned. (The
    interpret-mode kernel emulates any channel count via the thin per-tap
    compute path.)"""
    c, k = x_nhcw_shape[2], w_shape[3]
    return _shape_ok(x_nhcw_shape, w_shape) and c % 8 == 0 and k % 8 == 0


def _weights_3k3c(w_hwio: jax.Array) -> jax.Array:
    """(3, 3, C, K) -> (3, K, 3C) with layout [v][k][u*C + c]: one merged
    lhs per lane shift v, the three row taps u stacked in the contraction."""
    return w_hwio.transpose(1, 3, 0, 2).reshape(
        3, w_hwio.shape[3], 3 * w_hwio.shape[2])


def conv3x3_small_c(x_nhcw: jax.Array, w_hwio: jax.Array,
                    interpret: bool | None = None,
                    th: int | None = None) -> jax.Array:
    """Same-padding 3x3 conv, NHCW in / NHKW out (spatial-lanes Pallas).

    x: (N, H, C, W) float32 with W % 128 == 0; w: (3, 3, C, K) float32
    (HWIO, already scaled by any equalized-LR constant). Returns (N, H, K, W).
    """
    if interpret is None:
        interpret = _default_interpret()
    n, h, c, w_dim = x_nhcw.shape
    # interpret mode emulates any channel count (the thin per-tap path);
    # compiled Mosaic additionally needs the 8-aligned C/K of supported()
    assert _shape_ok(x_nhcw.shape, w_hwio.shape), \
        (x_nhcw.shape, w_hwio.shape)
    assert interpret or supported(x_nhcw.shape, w_hwio.shape), \
        (x_nhcw.shape, w_hwio.shape)
    k = w_hwio.shape[-1]
    th = th or _pick_th(h, c, k, w_dim)
    wt = _weights_3k3c(w_hwio)

    y = pl.pallas_call(
        partial(_kernel, C=c, K=k, TH=th, W=w_dim, H=h, N=n),
        out_shape=jax.ShapeDtypeStruct((n, h, k, w_dim), jnp.float32),
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # whole (unpadded) x in HBM
            pl.BlockSpec((3, k, 3 * c), lambda n_, t_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, k, w_dim),
                               lambda n_, t_: (n_, t_, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, c, w_dim + 256), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x_nhcw, wt)
    return y


def conv3x3_act_small_c(x_nhcw: jax.Array, w_hwio: jax.Array, b: jax.Array,
                        *, slope: float, pn_eps: float | None = None,
                        interpret: bool | None = None, th: int | None = None):
    """Fused conv + epilogue: bias -> leaky-relu(slope) -> optional
    pixelnorm, all applied to the accumulator in VMEM (see _kernel).

    Returns the activated output (N, H, K, W); with ``pn_eps`` set, returns
    ``(o, r)`` where ``r = rsqrt(mean_C(z^2) + pn_eps)`` of shape (N, H, W)
    is the pixelnorm scale the AD rules close on.
    """
    if interpret is None:
        interpret = _default_interpret()
    n, h, c, w_dim = x_nhcw.shape
    assert _shape_ok(x_nhcw.shape, w_hwio.shape), \
        (x_nhcw.shape, w_hwio.shape)
    assert interpret or supported(x_nhcw.shape, w_hwio.shape), \
        (x_nhcw.shape, w_hwio.shape)
    k = w_hwio.shape[-1]
    assert b.shape == (k,), (b.shape, k)
    th = th or _pick_th(h, c, k, w_dim)
    wt = _weights_3k3c(w_hwio)

    out_shape = [jax.ShapeDtypeStruct((n, h, k, w_dim), jnp.float32)]
    out_specs = [pl.BlockSpec((1, th, k, w_dim),
                              lambda n_, t_: (n_, t_, 0, 0),
                              memory_space=pltpu.VMEM)]
    if pn_eps is not None:
        out_shape.append(jax.ShapeDtypeStruct((n, h, w_dim), jnp.float32))
        out_specs.append(pl.BlockSpec((1, th, w_dim),
                                      lambda n_, t_: (n_, t_, 0),
                                      memory_space=pltpu.VMEM))
    res = pl.pallas_call(
        partial(_kernel, C=c, K=k, TH=th, W=w_dim, H=h, N=n,
                slope=float(slope), pn_eps=pn_eps, has_bias=True),
        out_shape=tuple(out_shape) if pn_eps is not None else out_shape[0],
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # whole (unpadded) x in HBM
            pl.BlockSpec((3, k, 3 * c), lambda n_, t_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1), lambda n_, t_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs) if pn_eps is not None else out_specs[0],
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, c, w_dim + 256), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x_nhcw, wt, b.reshape(k, 1))
    return res


# ---------------------------------------------------------------------------
# The weight-gradient kernel: dw[u,v,c,k] = sum_{n,i,j} x[n,c,i+u-1,j+v-1]
# * ct[n,k,i,j] — one read of x and ct, nine accumulated (C,W)x(K,W)->(C,K)
# lane-contraction dots per row, output accumulated in VMEM across the grid.
# ---------------------------------------------------------------------------
# Why a kernel: XLA's dedicated dw-conv formulation measured 40x off
# roofline on these shapes (~4.7 ms at 20-35 GiB/s, plus f32->bf16 layout
# copies, ~23% of the depth-8 train step), and the 9-tap einsum rewrite
# still compiled to ~1.8 ms reduction loop fusions re-reading both operands
# per tap. Reading each operand ONCE is the bandwidth floor.


def _dw_kernel(x_hbm, ct_ref, dw_ref, slab, sem, *, C, K, TH, W, H, N):
    n = pl.program_id(0)
    t = pl.program_id(1)
    T = H // TH
    slot = _fetch_halo_slab(x_hbm, slab, sem, n, t,
                            N=N, T=T, TH=TH, H=H, W=W)

    @pl.when(jnp.logical_and(n == 0, t == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    merged = C % 8 == 0
    dims = (((1,), (1,)), ((), ()))  # contract lanes with lanes: A @ B^T
    if merged:
        accs = [jnp.zeros((3 * C, K), jnp.float32) for _ in range(3)]
        for r in range(TH):
            ct_row = ct_ref[0, r]  # (K, W)
            for v in range(3):
                accs[v] = accs[v] + jax.lax.dot_general(
                    _taps(slab, slot, r, v, C=C, W=W, merged=True), ct_row,
                    dims, preferred_element_type=jnp.float32)
    else:
        accs9 = [[jnp.zeros((C, K), jnp.float32) for _ in range(3)]
                 for _ in range(3)]
        for r in range(TH):
            ct_row = ct_ref[0, r]
            for v in range(3):
                ops = _taps(slab, slot, r, v, C=C, W=W, merged=False)
                for u in range(3):
                    accs9[u][v] = accs9[u][v] + jax.lax.dot_general(
                        ops[u], ct_row, dims,
                        preferred_element_type=jnp.float32)
        accs = [jnp.concatenate([accs9[u][v] for u in range(3)], axis=0)
                for v in range(3)]
    for v in range(3):
        dw_ref[v] = dw_ref[v] + accs[v]


def conv3x3_dw_small_c(x_nhcw: jax.Array, ct_nhkw: jax.Array,
                       interpret: bool | None = None,
                       th: int | None = None) -> jax.Array:
    """Weight gradient of the same-padding 3x3 conv: (x, dy) -> (3,3,C,K)."""
    if interpret is None:
        interpret = _default_interpret()
    n, h, c, w_dim = x_nhcw.shape
    k = ct_nhkw.shape[2]
    assert ct_nhkw.shape == (n, h, k, w_dim), (x_nhcw.shape, ct_nhkw.shape)
    th = th or _pick_th(h, c, k, w_dim)
    dw = pl.pallas_call(
        partial(_dw_kernel, C=c, K=k, TH=th, W=w_dim, H=h, N=n),
        out_shape=jax.ShapeDtypeStruct((3, 3 * c, k), jnp.float32),
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # whole x in HBM
            pl.BlockSpec((1, th, k, w_dim), lambda n_, t_: (n_, t_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # constant index map: the (3, 3C, K) accumulator lives in VMEM for
        # the whole grid and is written back once at the end
        out_specs=pl.BlockSpec((3, 3 * c, k), lambda n_, t_: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, c, w_dim + 256), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x_nhcw, ct_nhkw)
    # dw[v][u*C + c][k] -> (u, v, c, k) HWIO
    return dw.reshape(3, 3, c, k).transpose(1, 0, 2, 3)


def _dw_einsum(x, ct):
    """Nine shifted-slice einsums (the no-Pallas dw): each tap is a plain
    (C, N*H*W) @ (N*H*W, K) contraction over the in-range window — for row
    offset du = u-1 the cotangent rows [max(0,-du), H-max(0,du)) align with
    x rows [max(0,du), H+min(0,du)), and likewise for columns (zero-pad
    contributions vanish). Exact; used on non-TPU backends."""
    n, h, c, w = x.shape
    k = ct.shape[2]
    taps = []
    for u in range(3):
        du = u - 1
        xr0, cr0 = max(0, du), max(0, -du)
        rows = h - abs(du)
        for v in range(3):
            dv = v - 1
            xc0, cc0 = max(0, dv), max(0, -dv)
            cols = w - abs(dv)
            xs = jax.lax.slice(x, (0, xr0, 0, xc0),
                               (n, xr0 + rows, c, xc0 + cols))
            cs = jax.lax.slice(ct, (0, cr0, 0, cc0),
                               (n, cr0 + rows, k, cc0 + cols))
            taps.append(jnp.einsum("nhcw,nhkw->ck", xs, cs,
                                   preferred_element_type=jnp.float32))
    return jnp.stack(taps).reshape(3, 3, c, k)


# ---------------------------------------------------------------------------
# The conv3x3 primitive: differentiable to any order, Pallas everywhere the
# FLOPs are.
# ---------------------------------------------------------------------------
# The op is bilinear in (x, w), so jvp + transpose rules close it under
# arbitrarily nested forward/reverse AD (``ad.defbilinear``):
#   - tangents:     conv(tx, w) and conv(x, tw)   -> this primitive (Pallas)
#   - x-cotangent:  conv(ct, flip_io(w))          -> this primitive (Pallas)
#   - w-cotangent:  the conv3x3_dw primitive below (Pallas dw kernel)
# This is what round 1's custom_vjp/custom_jvp wrappers could not provide:
# the VJP residuals leaked raw pallas_calls that reverse-over-reverse (the
# WGAN-GP gradient penalty) could not differentiate, forcing lax derivatives.

conv3x3_p = jex_core.Primitive("pggan_conv3x3")


def conv3x3(x_nhcw: jax.Array, w_hwio: jax.Array) -> jax.Array:
    """Differentiable (any order) same-padding 3x3 conv, NHCW, Pallas."""
    return conv3x3_p.bind(x_nhcw, w_hwio)


def _conv3x3_abstract(x, w):
    assert supported(x.shape, w.shape), (x.shape, w.shape)
    n, h, c, wd = x.shape
    return jax.core.ShapedArray((n, h, w.shape[-1], wd), x.dtype)


def _flip_io(w_hwio: jax.Array) -> jax.Array:
    """Spatially flipped, in/out-swapped weights: the conv-transpose kernel."""
    return w_hwio[::-1, ::-1].transpose(0, 1, 3, 2)


def _dx_transpose(ct, _x_undef, w):
    # d/dx: same-padding conv of the cotangent with the flipped kernel —
    # stays on the spatial-lanes Pallas kernel (this is the hot per-pixel
    # gradient both in the D backward and in the GP's grad-of-grad).
    return conv3x3(ct, _flip_io(w))


def _dw_transpose(ct, x, _w_undef):
    # d/dw: the second bilinear primitive below — the Pallas dw kernel on
    # TPU, the shifted-slice einsums elsewhere. Being a primitive (not a
    # raw pallas_call) keeps THIS rule differentiable too, which WGAN-GP's
    # reverse-over-reverse requires.
    return conv3x3_dw(x, ct)


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


# -- the dw primitive: (x, ct) -> (3, 3, C, K), bilinear -------------------
# Its transposes are convs of the OTHER operand with the weight-cotangent,
# so the two primitives close on each other under arbitrarily nested AD:
#   d/d(ct) of <cw, dw(x, ct)> = conv3x3(x, cw)
#   d/d(x)  of <cw, dw(x, ct)> = conv3x3(ct, flip_io(cw))

conv3x3_dw_p = jex_core.Primitive("pggan_conv3x3_dw")


def conv3x3_dw(x_nhcw: jax.Array, ct_nhkw: jax.Array) -> jax.Array:
    """Differentiable (any order) weight gradient of the 3x3 conv."""
    return conv3x3_dw_p.bind(x_nhcw, ct_nhkw)


def _dw_abstract(x, ct):
    n, h, c, w = x.shape
    assert (ct.shape[0], ct.shape[1], ct.shape[3]) == (n, h, w), \
        (x.shape, ct.shape)
    return jax.core.ShapedArray((3, 3, c, ct.shape[2]), x.dtype)


def _dw_impl(x, ct):
    # the Mosaic kernel needs lane/sublane-aligned W/H; fall back to the
    # einsum formulation off-TPU or for unsupported shapes
    if _default_interpret() or not supported(x.shape,
                                             (3, 3, x.shape[2], ct.shape[2])):
        return _dw_einsum(x, ct)
    return conv3x3_dw_small_c(x, ct)


def _dw_x_transpose(cw, _x_undef, ct):
    return conv3x3(ct, _flip_io(cw))


def _dw_ct_transpose(cw, x, _ct_undef):
    return conv3x3(x, cw)


def _dw_batch(args, dims):
    # one-sided vmap broadcasts the unbatched operand (ADVICE r2); the
    # batched case lowers to per-example binds — O(b) launches, acceptable
    # because the training step never vmaps this primitive (grads arrive
    # pre-summed over the batch) and test batches are tiny
    x, ct = args
    bx, bct = dims
    if bx is None:
        b = ct.shape[bct]
        x, bx = jnp.broadcast_to(x[None], (b,) + x.shape), 0
    if bct is None:
        b = x.shape[bx]
        ct, bct = jnp.broadcast_to(ct[None], (b,) + ct.shape), 0
    x = jnp.moveaxis(x, bx, 0)
    ct = jnp.moveaxis(ct, bct, 0)
    b = x.shape[0]
    dws = [conv3x3_dw(x[i], ct[i]) for i in range(b)]
    return jnp.stack(dws), 0


conv3x3_dw_p.def_abstract_eval(_dw_abstract)
conv3x3_dw_p.def_impl(_dw_impl)
mlir.register_lowering(
    conv3x3_dw_p, mlir.lower_fun(_dw_impl, multiple_results=False))
ad.defbilinear(conv3x3_dw_p, _dw_x_transpose, _dw_ct_transpose)
batching.primitive_batchers[conv3x3_dw_p] = _dw_batch


# ---------------------------------------------------------------------------
# Fused conv+epilogue primitives: bias -> leaky-relu -> (pixelnorm).
# ---------------------------------------------------------------------------
# Why primitives with hand-written JVP rules rather than custom_jvp
# wrappers: the rules must (a) skip ad.Zero tangent terms so the GP's
# grad-wrt-input doesn't run a dead conv3x3(x, 0) kernel, and (b) stay
# differentiable to ANY order — achieved by re-binding the fused primitive
# for the primal inside its own rule and expressing every tangent term via
# the bilinear conv3x3/conv3x3_dw primitives plus elementwise ops.
#
# The closure trick: for slope > 0, sign(o) == sign(z) == sign(y), so the
# activation mask is recoverable from the OUTPUT — no pre-activation
# residual needs to leave the kernel. For pixelnorm the kernel additionally
# emits r = rsqrt(mean_C(z^2)+eps); with o = z*r the whole JVP closes on
# (o, r):  tz = mask * ty;  s = mean_C(o * tz);
#          to = r * (tz - o * s);   tr = -r^2 * s.
# (slope == 0, i.e. hard ReLU, destroys the sign information — callers fall
# back to the unfused composition; the reference default is leaky 0.2.)

conv3x3_act_p = jex_core.Primitive("pggan_conv3x3_act")
conv3x3_act_pn_p = jex_core.Primitive("pggan_conv3x3_act_pn")
conv3x3_act_pn_p.multiple_results = True


def conv3x3_act(x_nhcw: jax.Array, w_hwio: jax.Array, b: jax.Array,
                *, slope: float) -> jax.Array:
    """Fused leaky_relu(conv3x3(x, w) + b, slope); any-order differentiable.

    Requires slope > 0 (the mask-from-output closure; reference epilogue
    network.py:32-36 with the default LeakyReLU(0.2)).
    """
    assert slope > 0, "fused epilogue requires a leaky slope (see module)"
    return conv3x3_act_p.bind(x_nhcw, w_hwio, b, slope=float(slope))


def conv3x3_act_pn(x_nhcw: jax.Array, w_hwio: jax.Array, b: jax.Array,
                   *, slope: float, eps: float = 1e-8) -> jax.Array:
    """Fused pixelnorm(leaky_relu(conv3x3(x, w) + b)); any-order
    differentiable (reference epilogue network.py:32-41)."""
    assert slope > 0, "fused epilogue requires a leaky slope (see module)"
    o, _r = conv3x3_act_pn_p.bind(x_nhcw, w_hwio, b,
                                  slope=float(slope), eps=float(eps))
    return o


def _act_out_aval(x, w, b):
    assert supported(x.shape, w.shape), (x.shape, w.shape)
    assert b.shape == (w.shape[-1],), (b.shape, w.shape)
    n, h, _c, wd = x.shape
    return jax.core.ShapedArray((n, h, w.shape[-1], wd), x.dtype)


def _conv_tangent(x, w, tx, tw, tb, out_shape):
    """Tangent of conv3x3(x, w) + b — terms for non-Zero tangents only."""
    total = None
    if type(tx) is not ad.Zero:
        total = conv3x3(tx, w)
    if type(tw) is not ad.Zero:
        t = conv3x3(x, tw)
        total = t if total is None else total + t
    if type(tb) is not ad.Zero:
        t = tb[None, None, :, None]
        total = (jnp.broadcast_to(t, out_shape) if total is None
                 else total + t)
    return total


def _act_jvp(primals, tangents, *, slope):
    x, w, b = primals
    o = conv3x3_act_p.bind(x, w, b, slope=slope)  # re-bind: stays closed
    ty = _conv_tangent(x, w, *tangents, o.shape)
    if ty is None:
        return o, ad.Zero.from_primal_value(o)
    mask = jnp.where(o >= 0, jnp.float32(1.0), jnp.float32(slope))
    return o, ty * mask


def _act_pn_jvp(primals, tangents, *, slope, eps):
    x, w, b = primals
    o, r = conv3x3_act_pn_p.bind(x, w, b, slope=slope, eps=eps)
    ty = _conv_tangent(x, w, *tangents, o.shape)
    if ty is None:
        return [o, r], [ad.Zero.from_primal_value(o),
                        ad.Zero.from_primal_value(r)]
    mask = jnp.where(o >= 0, jnp.float32(1.0), jnp.float32(slope))
    tz = ty * mask
    rb = r[:, :, None, :]
    s = jnp.mean(o * tz, axis=2, keepdims=True)  # mean_C(o * tz), (N,H,1,W)
    to = rb * (tz - o * s)
    tr = -(r * r) * s[:, :, 0, :]
    return [o, r], [to, tr]


def _act_impl(x, w, b, *, slope):
    return conv3x3_act_small_c(x, w, b, slope=slope, pn_eps=None)


def _act_pn_impl(x, w, b, *, slope, eps):
    return conv3x3_act_small_c(x, w, b, slope=slope, pn_eps=eps)


def _act_batch(args, dims, *, slope):
    x, w, b = args
    bx, bw, bb = dims
    if bw is not None or bb is not None or bx is None:
        raise NotImplementedError("vmap over conv3x3_act weights/bias")
    x = jnp.moveaxis(x, bx, 0)
    bsz, n = x.shape[:2]
    y = conv3x3_act_p.bind(x.reshape((bsz * n,) + x.shape[2:]), w, b,
                           slope=slope)
    return y.reshape((bsz, n) + y.shape[1:]), 0


def _act_pn_batch(args, dims, *, slope, eps):
    x, w, b = args
    bx, bw, bb = dims
    if bw is not None or bb is not None or bx is None:
        raise NotImplementedError("vmap over conv3x3_act_pn weights/bias")
    x = jnp.moveaxis(x, bx, 0)
    bsz, n = x.shape[:2]
    o, r = conv3x3_act_pn_p.bind(x.reshape((bsz * n,) + x.shape[2:]), w, b,
                                 slope=slope, eps=eps)
    return ([o.reshape((bsz, n) + o.shape[1:]),
             r.reshape((bsz, n) + r.shape[1:])], [0, 0])


conv3x3_act_p.def_abstract_eval(
    lambda x, w, b, *, slope: _act_out_aval(x, w, b))
conv3x3_act_p.def_impl(_act_impl)
mlir.register_lowering(
    conv3x3_act_p, mlir.lower_fun(_act_impl, multiple_results=False))
ad.primitive_jvps[conv3x3_act_p] = _act_jvp
batching.primitive_batchers[conv3x3_act_p] = _act_batch


def _act_pn_abstract(x, w, b, *, slope, eps):
    o = _act_out_aval(x, w, b)
    n, h, _k, wd = o.shape
    return [o, jax.core.ShapedArray((n, h, wd), x.dtype)]


conv3x3_act_pn_p.def_abstract_eval(_act_pn_abstract)
conv3x3_act_pn_p.def_impl(_act_pn_impl)
mlir.register_lowering(
    conv3x3_act_pn_p, mlir.lower_fun(_act_pn_impl, multiple_results=True))
ad.primitive_jvps[conv3x3_act_pn_p] = _act_pn_jvp
batching.primitive_batchers[conv3x3_act_pn_p] = _act_pn_batch


def _lax_conv(x_nhcw, w):
    """Reference NHCW conv (tests + the dw formulation's parity checks)."""
    return jax.lax.conv_general_dilated(
        x_nhcw, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHCW", "HWIO", "NHCW"))
