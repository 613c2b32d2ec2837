"""Pallas TPU kernels for the PGGAN hot path.

Currently: the fused conv epilogue ``pixelnorm(lrelu(z + b))`` — the
elementwise+cross-channel chain that follows every equalized conv
(reference network.py:32-41) — as a single VMEM-resident kernel with a
custom VJP (also a Pallas kernel).

Status and honest rationale: XLA already fuses this chain into the conv
consumer in most graphs (measured equal on hardware), so the kernel is NOT
wired into the model path yet — it is exercised by its tests and by
``scripts/bench_pallas.py``, which A/Bs it against the XLA path on real
hardware. It exists to (a) pin the fusion behaviour rather
than trusting the compiler across versions, and (b) serve as the template for
the deeper Pallas work (small-channel spatial-lane convolutions for the
1024px tail) where XLA's conv emitter leaves bandwidth on the table.

Kernel layout: NHWC tensors are processed as (rows, channels) tiles — the
channel axis sits in lanes so the pixelnorm reduction is a lane reduction;
grid is over (N*H) row groups.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_SLOPE = 0.2


def _epilogue_fwd_kernel(z_ref, b_ref, h_ref, y_ref, *, eps: float):
    z = z_ref[:] + b_ref[:]
    h = jnp.where(z >= 0, z, z * NEG_SLOPE)
    h_ref[:] = h
    m = jnp.mean(h * h, axis=-1, keepdims=True)
    y_ref[:] = h * jax.lax.rsqrt(m + eps)


def _epilogue_bwd_kernel(h_ref, g_ref, dz_ref, *, eps: float):
    """VJP of y = h * rsqrt(mean(h^2) + eps) followed by lrelu':
    dh = r*g - h * r^3/C * <g, h>;  dz = dh * lrelu'(where h sign encodes z+b
    sign since lrelu preserves sign)."""
    h = h_ref[:]
    g = g_ref[:]
    c = h.shape[-1]
    m = jnp.mean(h * h, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(m + eps)
    dot = jnp.sum(g * h, axis=-1, keepdims=True)
    dh = r * g - h * (r * r * r) * (dot / c)
    dz_ref[:] = jnp.where(h >= 0, dh, dh * NEG_SLOPE)


def _rows_spec(rows_per_block, c):
    return pl.BlockSpec((rows_per_block, c), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _flatten(z):
    n, h, w, c = z.shape
    return z.reshape(n * h * w, c), (n, h, w, c)


def _pick_rows(total_rows: int) -> int:
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if total_rows % cand == 0:
            return cand
    return 1


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_act_pixelnorm(z: jax.Array, b: jax.Array, eps: float = 1e-8,
                        interpret: bool = False) -> jax.Array:
    """``pixelnorm(leaky_relu(z + b))`` as one Pallas kernel (NHWC)."""
    y, _ = _fwd_impl(z, b, eps, interpret)
    return y


def _fwd_impl(z, b, eps, interpret):
    zf, shape = _flatten(z)
    rows = _pick_rows(zf.shape[0])
    c = zf.shape[1]
    bb = jnp.broadcast_to(b.astype(zf.dtype), (rows, c))
    h, y = pl.pallas_call(
        partial(_epilogue_fwd_kernel, eps=eps),
        out_shape=(jax.ShapeDtypeStruct(zf.shape, zf.dtype),
                   jax.ShapeDtypeStruct(zf.shape, zf.dtype)),
        grid=(zf.shape[0] // rows,),
        in_specs=[_rows_spec(rows, c),
                  pl.BlockSpec((rows, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(_rows_spec(rows, c), _rows_spec(rows, c)),
        interpret=interpret,
    )(zf, bb)
    return y.reshape(shape), h.reshape(shape)


def _fwd_rule(z, b, eps, interpret):
    y, h = _fwd_impl(z, b, eps, interpret)
    return y, h


def _bwd_rule(eps, interpret, h, g):
    hf, shape = _flatten(h)
    gf, _ = _flatten(g)
    rows = _pick_rows(hf.shape[0])
    c = hf.shape[1]
    dz = pl.pallas_call(
        partial(_epilogue_bwd_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct(hf.shape, hf.dtype),
        grid=(hf.shape[0] // rows,),
        in_specs=[_rows_spec(rows, c), _rows_spec(rows, c)],
        out_specs=_rows_spec(rows, c),
        interpret=interpret,
    )(hf, gf)
    dz = dz.reshape(shape)
    db = jnp.sum(dz, axis=(0, 1, 2))
    return dz, db


fused_act_pixelnorm.defvjp(_fwd_rule, _bwd_rule)
