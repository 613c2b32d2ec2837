"""2x nearest upsample / 2x2 average pool as mutually-transposed linear
primitives.

Why primitives: XLA's autodiff derives the pool gradient as a pad-dilated
reduce-window and the upsample gradient as a 6-D strided reduce — at the
1024px stage those compiled to ~3-4 ms ops (plus layout copies of the 6-D
broadcast upsample itself at ~7 ms), ~25 ms of the depth-8 train step
(BASELINE.md). But the two ops are (up to a factor 4) each other's
transposes, and both have FAST forward formulations:

  - upsample: concat-then-reshape writes the output in its natural layout
    (1.9 ms vs 7.3 ms for broadcast-reshape on (3,512,16,512), measured);
  - average pool: plain reduce-window (3.4 ms fwd+bwd; reshape-mean and
    strided-phase-sum measured 4x / 40x slower).

Expressing each transpose by BINDING the partner primitive closes the pair
under arbitrarily nested AD (the WGAN-GP grad-of-grad included): every
derivative order of either op executes one of the two fast impls —
  upsample^T = 4 * avgpool        avgpool^T = 0.25 * upsample

Layout-agnostic: the spatial axes are static parameters, so the NHWC core
(ops/primitives.py) and the NHCW spatial-lanes tail (ops/spatial.py) share
these primitives.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.extend import core as jex_core
from jax.interpreters import ad, batching, mlir

upsample2x_p = jex_core.Primitive("pggan_upsample2x")
avgpool2x_p = jex_core.Primitive("pggan_avgpool2x")


def upsample_2x(x: jax.Array, h_axis: int, w_axis: int) -> jax.Array:
    """Nearest-neighbour 2x upsample of the two given spatial axes."""
    return upsample2x_p.bind(x, h_axis=int(h_axis), w_axis=int(w_axis))


def avg_pool_2x(x: jax.Array, h_axis: int, w_axis: int) -> jax.Array:
    """2x2 stride-2 average pool of the two given spatial axes."""
    return avgpool2x_p.bind(x, h_axis=int(h_axis), w_axis=int(w_axis))


def _scaled(shape, axes, factor):
    out = list(shape)
    for a in axes:
        assert factor > 1 or out[a] % 2 == 0, (shape, a)  # no silent floor
        out[a] = out[a] * factor if factor > 1 else out[a] // 2
    return tuple(out)


def _nhcw_kernel_ok(x, h_axis, w_axis, sup) -> bool:
    # The Pallas streaming kernels serve the spatial-lanes layout only:
    # (N, H, C, W) f32 with lane-aligned W (ops/pallas_resample.py). XLA's
    # reduce_window pool measured 3x off streaming bandwidth there and the
    # concat upsample paid an extra reshape copy (BASELINE.md round 3).
    import os
    if os.environ.get("PGGAN_PALLAS_RESAMPLE", "1") == "0":
        return False
    return (x.ndim == 4 and (h_axis, w_axis) == (1, 3)
            and x.dtype == jnp.float32 and sup(x.shape))


def _up_impl(x, *, h_axis, w_axis):
    from pggan_tpu.ops import pallas_resample as pr
    if _nhcw_kernel_ok(x, h_axis, w_axis, pr.up_supported):
        return pr.upsample2x_nhcw(x)
    # duplicate each spatial element by concatenating x with itself along a
    # fresh trailing unit axis, then folding that axis in — writes the
    # result directly in the operand's layout (the broadcast formulation
    # picks a (2,128)-tiled layout that costs an extra full-tensor copy)
    for a in (h_axis, w_axis):
        xe = x[..., None]
        moved = jnp.moveaxis(xe, -1, a + 1)
        x = jnp.concatenate([moved, moved], axis=a + 1).reshape(
            _scaled(x.shape, (a,), 2))
    return x


def _pool_impl(x, *, h_axis, w_axis):
    from pggan_tpu.ops import pallas_resample as pr
    if _nhcw_kernel_ok(x, h_axis, w_axis, pr.pool_supported):
        return pr.avgpool2x_nhcw(x)
    dims = [1] * x.ndim
    dims[h_axis] = dims[w_axis] = 2
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, tuple(dims), tuple(dims), "VALID") * 0.25


def _up_abstract(x, *, h_axis, w_axis):
    return jax.core.ShapedArray(_scaled(x.shape, (h_axis, w_axis), 2),
                                x.dtype)


def _pool_abstract(x, *, h_axis, w_axis):
    shape = x.shape
    assert shape[h_axis] % 2 == 0 and shape[w_axis] % 2 == 0, shape
    return jax.core.ShapedArray(_scaled(shape, (h_axis, w_axis), 0), x.dtype)


def _up_transpose(ct, _x, *, h_axis, w_axis):
    # <ct, up(x)> = <4 * avgpool(ct), x>
    return (4.0 * avg_pool_2x(ct, h_axis, w_axis),)


def _pool_transpose(ct, _x, *, h_axis, w_axis):
    # <ct, 0.25 * sumpool(x)> = <0.25 * up(ct), x>
    return (0.25 * upsample_2x(ct, h_axis, w_axis),)


def _batcher(bind_fn, args, dims, *, h_axis, w_axis):
    (x,), (bx,) = args, dims
    x = jnp.moveaxis(x, bx, 0)
    return bind_fn(x, h_axis + 1, w_axis + 1), 0


for prim, impl, abstract, transpose, bind_fn in (
    (upsample2x_p, _up_impl, _up_abstract, _up_transpose, upsample_2x),
    (avgpool2x_p, _pool_impl, _pool_abstract, _pool_transpose, avg_pool_2x),
):
    prim.def_impl(impl)
    prim.def_abstract_eval(abstract)
    mlir.register_lowering(prim, mlir.lower_fun(impl, multiple_results=False))
    ad.deflinear2(prim, transpose)
    batching.primitive_batchers[prim] = partial(_batcher, bind_fn)
