"""Pallas NHCW 2x resample kernels (pool / nearest-upsample).

Why: at the high-res tail, XLA's ``reduce_window`` pool measures ~207 GiB/s
— 3x off the chip's streaming bandwidth — and the concat-based upsample
pays an extra full-tensor reshape copy plus 5-D layout copies in its AD
echoes (depth-8 profile, BASELINE.md round 3). Both ops are pure streaming:
these kernels read each input once and write each output once.

The lane dimension cannot be halved/doubled in-register (Mosaic supports
neither lane-merging reshapes nor cheap lane-strided gathers; pltpu.repeat
tiles rather than interleaves — probed on chip), so lane resampling runs on
the MXU against a small constant pairing matrix, with two tricks that make
the dot free in practice:
  - the block's rows are merged into the sublane dim first (leading-dim
    reshapes are free when C % 8 == 0), so the dot runs at full 128-sublane
    utilization instead of C/128;
  - the contraction is chunked to 256->128 (pool) / 128->256 (upsample)
    lane windows, cutting FLOPs by W/256 vs a full (W, W/2) matrix. A first
    full-matrix version measured SLOWER than reduce_window (51 ms of
    custom-call at depth 8) — the chunked form is ~25x less MXU work.
  - Precision.HIGHEST: Mosaic's default dot is single-pass bf16 (4e-3 rel
    error, measured); the 3-pass f32 decomposition reconstructs one-hot /
    pair contractions exactly (0.0 measured on chip).

These are IMPL-LEVEL replacements behind the linear primitives in
ops/resample.py: abstract eval, transpose (the mutually-transposed pair)
and batching rules are untouched, so the AD closure — any derivative order
executes one of the two fast impls — is preserved by construction.

Layout contract: (N, H, C, W) float32, C % 8 == 0 sublanes, W lanes with
W % 256 == 0 for pool (output stays lane-aligned) and W % 128 == 0 for
upsample.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pggan_tpu.ops.pallas_conv import _default_interpret

_EXACT = jax.lax.Precision.HIGHEST


def _pick_rows(h_blocks: int, row_bytes: int, budget=6 * 1024 * 1024) -> int:
    """Largest power-of-two block row count whose io blocks fit VMEM."""
    for cand in (64, 32, 16, 8, 4, 2, 1):
        if h_blocks % cand == 0 and cand * row_bytes <= budget:
            return cand
    return 1


def pool_supported(shape) -> bool:
    return (len(shape) == 4 and shape[1] % 2 == 0 and shape[3] % 256 == 0
            and shape[2] % 8 == 0 and shape[2] >= 8)


def up_supported(shape) -> bool:
    return (len(shape) == 4 and shape[3] % 128 == 0
            and shape[2] % 8 == 0 and shape[2] >= 8)


def _pair_sum_matrix() -> np.ndarray:
    """(256, 128) with P[i, i // 2] = 1: ``s @ P`` sums adjacent lane pairs
    of a 256-lane chunk."""
    p = np.zeros((256, 128), np.float32)
    p[np.arange(256), np.arange(256) // 2] = 1.0
    return p


def _dup_matrix() -> np.ndarray:
    """(128, 256) with Q[i, 2i] = Q[i, 2i+1] = 1: ``a @ Q`` duplicates each
    lane of a 128-lane chunk."""
    q = np.zeros((128, 256), np.float32)
    q[np.arange(128), 2 * np.arange(128)] = 1.0
    q[np.arange(128), 2 * np.arange(128) + 1] = 1.0
    return q


def _pool_kernel(x_ref, p_ref, y_ref, *, TH, C, W):
    s = x_ref[0].reshape(TH, 2, C, W)  # leading-dim split: free
    s = s[:, 0] + s[:, 1]              # (TH, C, W) row-pair sum
    m = s.reshape(TH * C, W)           # rows -> sublanes: free (C % 8 == 0)
    for k in range(W // 256):
        d = jax.lax.dot_general(
            m[:, 256 * k:256 * (k + 1)], p_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_EXACT)
        y_ref[0, :, :, 128 * k:128 * (k + 1)] = (
            0.25 * d.reshape(TH, C, 128))


def _up_kernel(x_ref, q_ref, y_ref, *, TH, C, W):
    m = x_ref[0].reshape(TH * C, W)
    for k in range(W // 128):
        e = jax.lax.dot_general(
            m[:, 128 * k:128 * (k + 1)], q_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_EXACT)
        er = e.reshape(TH, 1, C, 256)
        pair = jnp.broadcast_to(er, (TH, 2, C, 256)).reshape(2 * TH, C, 256)
        y_ref[0, :, :, 256 * k:256 * (k + 1)] = pair


def avgpool2x_nhcw(x: jax.Array, interpret: bool | None = None) -> jax.Array:
    """2x2 stride-2 average pool, (N, H, C, W) -> (N, H/2, C, W/2)."""
    if interpret is None:
        interpret = _default_interpret()
    n, h, c, w = x.shape
    assert pool_supported(x.shape), x.shape
    th = _pick_rows(h // 2, 2 * c * w * 4 + c * (w // 2) * 4)
    return pl.pallas_call(
        partial(_pool_kernel, TH=th, C=c, W=w),
        out_shape=jax.ShapeDtypeStruct((n, h // 2, c, w // 2), jnp.float32),
        grid=(n, h // 2 // th),
        in_specs=[
            pl.BlockSpec((1, 2 * th, c, w), lambda n_, t_: (n_, t_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 128), lambda n_, t_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, c, w // 2),
                               lambda n_, t_: (n_, t_, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, _pair_sum_matrix())


def upsample2x_nhcw(x: jax.Array, interpret: bool | None = None) -> jax.Array:
    """Nearest 2x upsample, (N, H, C, W) -> (N, 2H, C, 2W)."""
    if interpret is None:
        interpret = _default_interpret()
    n, h, c, w = x.shape
    assert up_supported(x.shape), x.shape
    th = _pick_rows(h, c * w * 4 + 4 * c * w * 4)
    return pl.pallas_call(
        partial(_up_kernel, TH=th, C=c, W=w),
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, c, 2 * w), jnp.float32),
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec((1, th, c, w), lambda n_, t_: (n_, t_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 256), lambda n_, t_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * th, c, 2 * w),
                               lambda n_, t_: (n_, t_, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, _dup_matrix())
