"""Core PGGAN math primitives, TPU-first.

Everything here is a pure function over ``jnp`` arrays in **NHWC** layout (the
TPU-native conv layout; the PyTorch reference is NCHW). Semantics mirror the
reference ``network.py``:

- equalized-learning-rate ("wscale") convolution: reference network.py:7-41
  computes an empirical per-layer constant ``c = sqrt(mean(w_init**2))`` from a
  kaiming-normal init and divides the stored weight by it, re-multiplying the
  input by ``c`` at runtime. Since kaiming-normal has ``E[w**2] = 2/fan_in``
  exactly, we fold the equivalent **static** He constant
  ``c = sqrt(2/fan_in)`` into the forward pass: weights are stored unit-normal
  and scaled by ``c`` at use. This is a compile-time constant XLA folds into
  the conv — no runtime cost, identical statistics.
- pixelwise feature norm: reference network.py:37-40.
- minibatch stddev: a single **global scalar** stddev of the whole activation
  tensor appended as one channel — reference network.py:174-187 (note: the
  reference deliberately differs from Karras' grouped version). Under data
  parallelism the batch axis may be sharded; because this is expressed as a
  plain global ``jnp.mean``, GSPMD inserts the cross-replica collective
  automatically, preserving the global-batch semantics.
- nearest 2x upsample / 2x2 avg-pool: reference network.py:127-129, 229-238.
- channel schedule ``nf``: reference network.py:94-95.
"""

from __future__ import annotations

import math


import jax
import jax.numpy as jnp


def nf(stage: int, fmap_base: int = 4096, fmap_decay: float = 1.0,
       fmap_max: int = 512) -> int:
    """Per-stage feature map count (reference network.py:94-95)."""
    return min(int(fmap_base / (2.0 ** (stage * fmap_decay))), fmap_max)


def he_constant(fan_in: int, gain: float = math.sqrt(2.0)) -> float:
    """Static equalized-LR constant ``c = gain / sqrt(fan_in)``.

    Matches the expectation of the reference's empirical
    ``sqrt(mean(kaiming_normal(w)**2))`` (network.py:19).
    """
    return gain / math.sqrt(fan_in)


def leaky_relu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    return jnp.where(x >= 0, x, x * negative_slope)


def pixelnorm(x: jax.Array, eps: float = 1e-8, axis: int = -1) -> jax.Array:
    """Pixelwise feature vector normalization (reference network.py:37-40).

    ``axis`` is the channel axis (-1 for NHWC).
    """
    return x * jax.lax.rsqrt(jnp.mean(x * x, axis=axis, keepdims=True) + eps)


def minibatch_stddev(x: jax.Array, eps: float = 1e-8,
                     groups: int = 1) -> jax.Array:
    """Append one channel holding the global scalar stddev of ``x``.

    Reference network.py:174-187 (``Tstdeps`` + ``MinibatchStddev``): the
    statistic is ``sqrt(mean((x - mean(x))**2) + 1e-8)`` over the *entire*
    (N, H, W, C) tensor, broadcast to an (N, H, W, 1) channel. When the batch
    axis is sharded over a data-parallel mesh, the global means here become
    XLA cross-replica reductions automatically (GSPMD), keeping the statistic
    a true global-batch quantity.

    ``groups > 1`` computes the statistic independently over ``groups``
    equal batch slices — exactly equivalent to ``groups`` separate calls on
    the slices. This lets the train step evaluate D on a concatenated
    [reals; fakes] batch in ONE pass (fewer op dispatches, fuller MXU)
    while preserving the reference's per-call statistic semantics.
    """
    xf = x.astype(jnp.float32)  # batch statistics always in f32
    if groups == 1:
        s = jnp.sqrt(jnp.mean(jnp.square(xf - jnp.mean(xf))) + eps)
        tile = jnp.broadcast_to(s, x.shape[:-1] + (1,)).astype(x.dtype)
        return jnp.concatenate([x, tile], axis=-1)
    n = x.shape[0]
    assert n % groups == 0, (n, groups)
    xg = xf.reshape((groups, n // groups) + x.shape[1:])
    mean = jnp.mean(xg, axis=tuple(range(1, xg.ndim)), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=tuple(range(1, xg.ndim)))
    s = jnp.sqrt(var + eps)  # (groups,)
    tile = jnp.broadcast_to(
        jnp.repeat(s, n // groups).reshape((n,) + (1,) * (x.ndim - 1)),
        x.shape[:-1] + (1,)).astype(x.dtype)
    return jnp.concatenate([x, tile], axis=-1)


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbour 2x spatial upsample, NHWC.

    Equivalent of ``F.upsample(scale_factor=2)`` (reference network.py:127).
    A linear primitive whose transpose is the fast average pool and whose
    concat-based impl avoids the broadcast formulation's layout copy
    (~3.7x, measured — ops/resample.py).
    """
    from pggan_tpu.ops.resample import upsample_2x
    return upsample_2x(x, h_axis=1, w_axis=2)


def avg_pool_2x(x: jax.Array) -> jax.Array:
    """2x2 stride-2 average pool, NHWC (``F.avg_pool2d(h, 2)``,
    reference network.py:229). A linear primitive whose transpose is the
    fast nearest-upsample instead of XLA autodiff's pad-dilated
    reduce-window (ops/resample.py)."""
    from pggan_tpu.ops.resample import avg_pool_2x as pool
    return pool(x, h_axis=1, w_axis=2)


# ---------------------------------------------------------------------------
# Equalized-LR layers (init + apply as pure functions)
# ---------------------------------------------------------------------------

def conv_init(key: jax.Array, ksize: int, ch_in: int, ch_out: int,
              wscale: bool = True, dtype=jnp.float32) -> dict:
    """Initialize an equalized-LR conv layer's parameters.

    Weights are HWIO. With ``wscale`` the stored weight is unit-normal and the
    He constant is applied at runtime (see module docstring); without it the
    weight keeps torch's default Conv2d init scale (uniform
    ``+-1/sqrt(fan_in)``) to mirror reference behaviour when wscale=False.
    """
    shape = (ksize, ksize, ch_in, ch_out)
    fan_in = ksize * ksize * ch_in
    bound = 1.0 / math.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    if wscale:
        w = jax.random.normal(kw, shape, dtype)
    else:
        w = jax.random.uniform(kw, shape, dtype, -bound, bound)
    # torch Conv2d keeps its default uniform(+-1/sqrt(fan_in)) bias even when
    # kaiming_normal overwrites the weight (reference network.py:16-17) —
    # replicate for init-distribution parity.
    b = jax.random.uniform(kb, (ch_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def dense_init(key: jax.Array, ch_in: int, ch_out: int,
               dtype=jnp.float32) -> dict:
    """torch ``nn.Linear`` default init (uniform +-1/sqrt(fan_in)),
    matching the reference's final D layer (network.py:219)."""
    bound = 1.0 / math.sqrt(ch_in)
    kw, kb = jax.random.split(key)
    w = jax.random.uniform(kw, (ch_in, ch_out), dtype, -bound, bound)
    b = jax.random.uniform(kb, (ch_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def equalized_conv2d(params: dict, x: jax.Array, *, padding: int = 1,
                     stride: int = 1, wscale: bool = True,
                     act: str | None = "lrelu",
                     use_pixelnorm: bool = True,
                     eps: float = 1e-8,
                     compute_dtype=None) -> jax.Array:
    """The reference's ``PGConv2d`` forward (network.py:32-41), NHWC.

    conv(x * c) -> optional activation -> optional pixelnorm. The runtime
    wscale constant is folded into the weight (scalar commutes with conv).

    Mixed precision (TPU-native): with ``compute_dtype=bfloat16`` the conv
    operands are cast to bf16 (feeding the MXU at full rate and halving the
    HBM traffic of inter-layer activations — the bottleneck at high
    resolutions where channel counts are small), while accumulation
    (``preferred_element_type``), bias, activation and the pixelnorm
    statistics stay in float32. Parameters are always stored float32.
    """
    w = params["w"]
    ksize, _, ch_in, _ = w.shape
    if wscale:
        w = w * he_constant(ksize * ksize * ch_in)
    if compute_dtype is not None:
        w = w.astype(compute_dtype)
        x = x.astype(compute_dtype)
    # In mixed precision the conv emits compute_dtype (the MXU still
    # accumulates bf16 products in f32 internally); asking for an f32 output
    # via preferred_element_type would break the conv transpose rule under
    # grad (mixed-dtype operands). Elementwise epilogue runs in f32 below.
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=(jnp.float32 if compute_dtype is None else None),
    )
    return _conv_epilogue(y, params["b"], act, use_pixelnorm, eps,
                          compute_dtype)


def equalized_dense(params: dict, x: jax.Array) -> jax.Array:
    """Plain linear layer (reference's final D ``nn.Linear``)."""
    return jnp.dot(x, params["w"], preferred_element_type=jnp.float32) + params["b"]


# ---------------------------------------------------------------------------
# Fused scale-change convolutions
# ---------------------------------------------------------------------------
# The reference materializes a 2x-upsampled tensor before each G stage conv
# (network.py:127-129) and a full-resolution conv output before each D
# downsample (network.py:235-238). On TPU those intermediates are pure HBM
# traffic — the dominant cost at high resolutions where channel counts are
# small. Both edges collapse into single XLA convolutions by convolution
# associativity (the "fused scale" trick of Karras' original TF
# implementation), bit-exact up to float reassociation:
#
#   conv3x3(nearest_up2x(x), w) == conv(x, ones2x2 (*) w, lhs_dilation=2)
#   avg_pool2x(conv3x3(x, w))   == conv(x, w (*) ones2x2/4, stride=2)
#
# where (*) is full 2-D cross-correlation superposition producing a 4x4
# kernel. The upsampled / full-res tensors are never written to memory, and
# the MXU still sees a plain (dilated/strided) convolution.

def _superpose_up(w3: jax.Array) -> jax.Array:
    """4x4 kernel K with K[p,q] = sum_{a,b in {0,1}} w3[p-a, q-b]."""
    k = jnp.zeros((4, 4) + w3.shape[2:], w3.dtype)
    for a in (0, 1):
        for b in (0, 1):
            k = k.at[a:a + 3, b:b + 3].add(w3)
    return k


def _conv_epilogue(y, b, act, use_pixelnorm, eps, compute_dtype):
    y = y.astype(jnp.float32) + b
    if act == "lrelu":
        y = leaky_relu(y, 0.2)
    elif act == "relu":
        y = jnp.maximum(y, 0.0)
    elif act is not None:
        raise ValueError(f"unknown act: {act!r}")
    if use_pixelnorm:
        y = pixelnorm(y, eps)
    if compute_dtype is not None:
        y = y.astype(compute_dtype)
    return y


def equalized_conv2d_up2x(params: dict, x: jax.Array, *, wscale: bool = True,
                          act: str | None = "lrelu",
                          use_pixelnorm: bool = True, eps: float = 1e-8,
                          compute_dtype=None) -> jax.Array:
    """Fused ``nearest_up2x -> 3x3 equalized conv -> act -> pixelnorm``.

    Exactly equal (modulo float reassociation) to
    ``equalized_conv2d(upsample_nearest_2x(x))`` with padding 1: output is
    (N, 2H, 2W, C_out). The wscale constant uses the logical 3x3 fan-in.
    """
    w = params["w"]
    assert w.shape[0] == 3 and w.shape[1] == 3, "up-fusion is for 3x3 convs"
    ch_in = w.shape[2]
    if wscale:
        w = w * he_constant(3 * 3 * ch_in)
    k = _superpose_up(w)
    if compute_dtype is not None:
        k = k.astype(compute_dtype)
        x = x.astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        x, k,
        window_strides=(1, 1),
        padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=(jnp.float32 if compute_dtype is None else None),
    )
    return _conv_epilogue(y, params["b"], act, use_pixelnorm, eps,
                          compute_dtype)


def equalized_conv2d_pool_in(params: dict, x: jax.Array, *,
                             wscale: bool = True, act: str | None = "lrelu",
                             use_pixelnorm: bool = False, eps: float = 1e-8,
                             compute_dtype=None) -> jax.Array:
    """Fused ``2x2 avg-pool -> 1x1 equalized conv`` (exact: pooling precedes
    the conv, so the mean commutes into the kernel).

    Used for the D fade path ``fromRGB(avg_pool2d(x))`` (reference
    network.py:231-232): a stride-2 2x2 conv with the 1x1 kernel spread at
    weight/4, so the pooled full-channel tensor is never materialized.
    """
    w = params["w"]
    assert w.shape[0] == 1 and w.shape[1] == 1, "pool-in fusion is for 1x1 convs"
    ch_in = w.shape[2]
    if wscale:
        w = w * he_constant(ch_in)
    k = jnp.broadcast_to(w * 0.25, (2, 2) + w.shape[2:])
    if compute_dtype is not None:
        k = k.astype(compute_dtype)
        x = x.astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        x, k,
        window_strides=(2, 2),
        padding=((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=(jnp.float32 if compute_dtype is None else None),
    )
    return _conv_epilogue(y, params["b"], act, use_pixelnorm, eps,
                          compute_dtype)
