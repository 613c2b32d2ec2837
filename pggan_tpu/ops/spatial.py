"""Spatial-lanes (NHCW) building blocks for the high-resolution model tails.

At the progressive pyramid's high-res stages the channel counts are tiny
(3..64), so the TPU-native NHWC layout wastes the 128-wide lanes and XLA
inserts layout copies around every conv (profiled at ~33% of the 1024px
step, BASELINE.md). These helpers keep those stages **NHCW end-to-end** —
H major, C in the sublanes, W in the lanes: the 3x3 convs run on the Pallas
spatial-lanes primitive (ops/pallas_conv.py — differentiable to any order,
so safe under WGAN-GP's grad-of-grad), and everything else (1x1 convs,
pools, upsamples, epilogues) is layout-preserving XLA. With H major the
conv kernels fetch edge-clamped halo slabs without alignment over-fetch and
merge the three row taps into one MXU contraction (see pallas_conv.py).

Semantics mirror the NHWC primitives in ops/primitives.py (reference
network.py:7-41): equalized-LR scaling folded as a static constant,
bias -> (leaky)ReLU -> optional pixelnorm over the channel axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import os

from pggan_tpu.ops.pallas_conv import conv3x3, conv3x3_act, conv3x3_act_pn
from pggan_tpu.ops.primitives import he_constant, leaky_relu
from pggan_tpu.ops.resample import avg_pool_2x as _avg_pool_2x
from pggan_tpu.ops.resample import upsample_2x as _upsample_2x


# -- spatial-lanes envelope ---------------------------------------------------
# Which stages run NHCW at all. Single-sourced here so the Generator tail and
# Discriminator head can never diverge when the boundary is re-tuned (it moves
# with each round's profiles). Module-level so PGGAN_PALLAS_MAX_CIN / _HI are
# read once; tests/benches may also assign spatial.PALLAS_MAX_CIN directly.
PALLAS_MIN_RES = 128
PALLAS_MAX_CIN = int(os.environ.get("PGGAN_PALLAS_MAX_CIN", "32"))
PALLAS_HI_RES = 256
PALLAS_MAX_CIN_HI = int(os.environ.get("PGGAN_PALLAS_MAX_CIN_HI", "64"))


def stage_in_envelope(res: int, ch_in: int, ch_out: int,
                      entry: bool = True) -> bool:
    """Does a conv stage at ``res`` px with ``ch_in -> ch_out`` channels
    belong on the NHCW spatial-lanes path?

    Requirements: W lane-aligned (>= 128, % 128 — Mosaic lane width) and
    both channel counts 8-aligned (they sit in the tiled sublane dim,
    ops/pallas_conv.py). The C boundary is profile-placed per round and
    RESOLUTION-TIERED (BASELINE.md round 3): C=64 stages lose at 128px
    (depth-5 step 40.8 XLA vs 50.5 ms — compute-bound, W=128 is a single
    lane-tile, and the NHWC->NHCW entry switch buys nothing) but win at
    >= 256px (depth-6 step 81.0 vs 97.6 — the XLA convs they replace ran at
    123-156 GiB/s). ``entry=False`` marks a span CONTINUATION whose input
    is already NHCW: there C<=64 wins at any lane-aligned resolution
    (depth-6 81.0 vs 86.2 ms when the 128px continuation is included)."""
    lim_entry = PALLAS_MAX_CIN_HI if res >= PALLAS_HI_RES else PALLAS_MAX_CIN
    lim = lim_entry if entry else PALLAS_MAX_CIN_HI
    return (res >= PALLAS_MIN_RES and res % 128 == 0 and ch_in <= lim
            and ch_in % 8 == 0 and ch_out % 8 == 0)


def _act(y: jax.Array, act: str | None) -> jax.Array:
    if act == "lrelu":
        return leaky_relu(y, 0.2)
    if act == "relu":
        return jnp.maximum(y, 0.0)
    if act is None:
        return y
    raise ValueError(f"unknown act: {act!r}")


def pixelnorm_c(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Pixelwise feature norm over the channel axis (dim 2 in NHCW)."""
    return x * jax.lax.rsqrt(jnp.mean(x * x, axis=2, keepdims=True) + eps)


def conv1x1(params: dict, x: jax.Array, *, wscale: bool = True,
            act: str | None = "lrelu", use_pixelnorm: bool = False,
            eps: float = 1e-8) -> jax.Array:
    """Equalized 1x1 conv as a channel einsum (fromRGB / toRGB)."""
    w = params["w"][0, 0]
    if wscale:
        w = w * he_constant(w.shape[0])
    y = jnp.einsum("nhcw,ck->nhkw", x, w,
                   preferred_element_type=jnp.float32)
    y = _act(y + params["b"][None, None, :, None], act)
    return pixelnorm_c(y, eps) if use_pixelnorm else y


def conv3x3_block(params: dict, x: jax.Array, *, wscale: bool = True,
                  act: str | None = "lrelu", use_pixelnorm: bool = True,
                  eps: float = 1e-8) -> jax.Array:
    """Equalized 3x3 conv (Pallas spatial-lanes) + bias/act/pixelnorm.

    The epilogue is fused INTO the kernel (computed on the VMEM accumulator
    before the output DMA) whenever the activation is leaky — a pallas_call
    is opaque to XLA fusion, so the composed form pays a separate
    full-tensor HBM read+write per conv (~60% of the depth-8 step,
    BASELINE.md). ``PGGAN_FUSE_EPILOGUE=0`` restores the composition (A/B
    benchmarking); hard ReLU (slope 0) always composes — the fused rules
    need the leaky sign closure (ops/pallas_conv.py).
    """
    w = params["w"]
    if wscale:
        w = w * he_constant(9 * w.shape[2])
    if act == "lrelu" and os.environ.get("PGGAN_FUSE_EPILOGUE", "1") != "0":
        if use_pixelnorm:
            return conv3x3_act_pn(x, w, params["b"], slope=0.2, eps=eps)
        return conv3x3_act(x, w, params["b"], slope=0.2)
    y = conv3x3(x, w)
    y = _act(y + params["b"][None, None, :, None], act)
    return pixelnorm_c(y, eps) if use_pixelnorm else y


def conv3x3_block_pair(p1: dict, p2: dict, x: jax.Array, *,
                       wscale: bool = True, use_pixelnorm: bool = True,
                       eps: float = 1e-8) -> jax.Array:
    """Both equalized 3x3 convs of a G growth block (c1 -> c2, each with the
    bias/leaky-relu/pixelnorm epilogue) as ONE fused Pallas kernel whose
    intermediate never touches HBM (ops/pallas_chain.py). FORWARD-ONLY —
    serving path use (Generator.inference_chain); training keeps the
    per-conv any-order-AD primitives."""
    from pggan_tpu.ops.pallas_chain import conv3x3_chain
    w1, w2 = p1["w"], p2["w"]
    if wscale:
        w1 = w1 * he_constant(9 * w1.shape[2])
        w2 = w2 * he_constant(9 * w2.shape[2])
    return conv3x3_chain(x, w1, p1["b"], w2, p2["b"], slope=0.2,
                         pn_eps=eps if use_pixelnorm else None)


def chain_pair_supported(x_shape, p1, p2) -> bool:
    """Can the compiled chain kernel fuse this block's conv pair?"""
    from pggan_tpu.ops.pallas_chain import chain_supported
    return chain_supported(x_shape, p1["w"].shape, p2["w"].shape)


def avg_pool_2x(x: jax.Array) -> jax.Array:
    """2x2 stride-2 average pool, NHCW (linear primitive whose transpose is
    the fast nearest-upsample — see ops/resample.py)."""
    return _avg_pool_2x(x, h_axis=1, w_axis=3)


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """Nearest 2x upsample, NHCW (linear primitive whose transpose is the
    fast pool; the concat-based impl beats broadcast+reshape ~3.7x on TPU —
    see ops/resample.py)."""
    return _upsample_2x(x, h_axis=1, w_axis=3)


def shard_map_batch(fn, mesh, batch_axis: str, n_array_args: int,
                    batch_size: int | None = None):
    """Wrap a (params, arr..., scalar) function in shard_map over the batch
    axis when a >1-device mesh is present. pallas_call is opaque to GSPMD —
    without manual sharding the partitioner would all-gather its operands.
    The wrapped region must be purely per-example (all NHCW tail/head
    subgraphs are).

    Args order contract: ``fn(params_pytree, *arrays, scalar)`` where every
    array is batch-major. When ``batch_size`` is given and doesn't divide
    the axis (e.g. an odd sampling batch outside training), fall back to the
    unwrapped function — GSPMD then replicates around the kernels, which is
    slower but correct.
    """
    if mesh is None or dict(mesh.shape).get(batch_axis, 1) <= 1:
        return fn
    if batch_size is not None and batch_size % dict(mesh.shape)[batch_axis]:
        return fn
    from jax.sharding import PartitionSpec as P
    # check_vma off: replicated-param cotangents under grad-of-grad trip the
    # varying-axes checker; equivalence is pinned by tests
    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(),) + (P(batch_axis),) * n_array_args + (P(),),
        out_specs=P(batch_axis), check_vma=False)
