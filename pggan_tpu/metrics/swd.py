"""Sliced Wasserstein Distance (SWD) over Laplacian-pyramid patch
descriptors — the evaluation metric of the progressive-growing paper
(Karras et al. 2018, appendix A).

The reference framework (deepsound-project/pggan-pytorch) ships NO quality
metric at all; this module closes that gap with a TPU-native design:

- every stage is a fixed-shape jitted XLA program (binomial-blur pyramids as
  separable depthwise convs, patch gathers as vmapped ``dynamic_slice``,
  random projections as one (N, D) @ (D, P) MXU matmul, per-direction sort
  via ``jnp.sort``);
- descriptor extraction and scoring stream per minibatch on device, so the
  full image sets never need to fit in HBM at once;
- randomness comes from ``jax.random`` keys, so a given (key, shapes) pair
  is exactly reproducible across hosts.

Variance-reduction semantics (deliberate, differs from naive independent
sampling): patch positions are drawn from per-image keys folded from ONE
base key shared by the real and fake sets — common random numbers. Both
clouds sample identical positions, so ``swd(a, a) == 0`` exactly at every
level (no sampling-noise floor on identical sets) and real-vs-fake scores
have strictly lower estimator variance than independent draws, while the
estimator itself stays unbiased (positions are uniform either way). Keys
fold in the GLOBAL image index (not the chunk offset), so results are
independent of the ``minibatch`` streaming granularity.

Protocol (paper appendix A; constants are the paper's, configurable here):
each image set is decomposed into a Laplacian pyramid whose levels span
16x16 up to full resolution, ``nhoods_per_image`` random 7x7xC patches are
drawn per image per level, each set's descriptors are normalized per color
channel, and the sliced Wasserstein approximation — project both clouds on
random unit directions, sort, mean |difference| — is averaged over
``dir_repeats`` draws of ``dirs_per_repeat`` directions. Values are
conventionally reported x1e3.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

# 5-tap binomial (Gaussian-approximating) filter of the classic Burt-Adelson
# pyramid; outer product gives the 5x5 kernel. Normalized to unit DC gain.
_BINOMIAL5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0


def _blur5(x: jnp.ndarray, gain: float = 1.0) -> jnp.ndarray:
    """Separable 5-tap binomial blur, reflect padding, NHWC, per channel.

    Two rank-1 depthwise convs instead of one 5x5: same result, 2/5 the
    MACs, and XLA fuses the pair. Reflect padding keeps level statistics
    unbiased at the borders (zero padding would darken every edge patch and
    the metric samples patches uniformly, borders included).

    ``gain`` scales the overall 2-D response once — it is applied to the
    row pass only, NOT baked into both separable 1-D kernels (which would
    square it: a gain-4 expand filter would have DC gain 16 and every
    Laplacian residual would measure ``x - 4*expected`` instead of the
    intended frequency band).
    """
    n, h, w, c = x.shape
    k = jnp.asarray(_BINOMIAL5)
    x = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
    # depthwise via feature_group_count=C on a (5,1,1,C)/(1,5,1,C) kernel
    kh = jnp.tile((k * gain).reshape(5, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(k.reshape(1, 5, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=c)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=c)
    return x


def pyr_down(x: jnp.ndarray) -> jnp.ndarray:
    """Gaussian-pyramid reduce: binomial blur then 2x2 subsample (NHWC)."""
    return _blur5(x)[:, ::2, ::2, :]


def pyr_up(x: jnp.ndarray) -> jnp.ndarray:
    """Gaussian-pyramid expand: zero-insert 2x then blur with 4x gain
    (the zero insertion leaves 1/4 of the samples non-zero, so the blur
    gain restores unit DC response)."""
    n, h, w, c = x.shape
    up = jnp.zeros((n, 2 * h, 2 * w, c), x.dtype).at[:, ::2, ::2, :].set(x)
    return _blur5(up, gain=4.0)


def laplacian_levels(x: jnp.ndarray, n_levels: int) -> list[jnp.ndarray]:
    """Laplacian pyramid of an NHWC batch, finest first.

    Levels 0..n-2 are band-pass residuals ``G_k - pyr_up(G_{k+1})``; the
    last level is the coarsest Gaussian itself (so the pyramid is a complete
    invertible decomposition, matching the paper's use of the 16x16 base as
    the lowest-resolution descriptor level).
    """
    levels = []
    for _ in range(n_levels - 1):
        down = pyr_down(x)
        levels.append(x - pyr_up(down))
        x = down
    levels.append(x)
    return levels


def _extract_patches(level: jnp.ndarray, img_keys: jax.Array,
                     nhoods: int, size: int) -> jnp.ndarray:
    """``nhoods`` random size x size x C patches per image -> (N*nhoods, D).

    ``img_keys`` is one PRNG key PER IMAGE; positions are uniform over valid
    top-left corners and depend only on the image's key, never on its chunk
    neighbours. The double-vmapped ``dynamic_slice`` lowers to one fused
    gather — no materialized all-patches tensor (which at 1024px would be
    ~600x the image itself).
    """
    n, h, w, c = level.shape

    def positions(k):
        ky, kx = jax.random.split(k)
        return (jax.random.randint(ky, (nhoods,), 0, h - size + 1),
                jax.random.randint(kx, (nhoods,), 0, w - size + 1))

    ys, xs = jax.vmap(positions)(img_keys)

    def one(img, y, x):
        return jax.lax.dynamic_slice(img, (y, x, 0), (size, size, c))

    patches = jax.vmap(  # over images
        jax.vmap(one, in_axes=(None, 0, 0))  # over patches within an image
    )(level, ys, xs)
    return patches.reshape(n * nhoods, size * size * c)


@partial(jax.jit, static_argnames=("n_levels", "nhoods", "size"))
def _chunk_descriptors(chunk: jnp.ndarray, img_keys: jax.Array,
                       n_levels: int, nhoods: int, size: int) -> tuple:
    """Patch descriptors for EVERY pyramid level of one image chunk, as one
    jitted program: the Laplacian pyramid is computed once and each level's
    patches are gathered from it (the per-(chunk, level) variant recomputed
    the full pyramid per level — O(n_levels^2) blur work, 7x redundant at
    1024px). Per-level keys fold the level index into each image key so
    levels draw independent positions."""
    levels = laplacian_levels(chunk, n_levels)
    return tuple(
        _extract_patches(
            lv_img,
            jax.vmap(lambda k: jax.random.fold_in(k, lv))(img_keys),
            nhoods, size)
        for lv, lv_img in enumerate(levels))


def _normalize_descriptors(desc: jnp.ndarray, size: int,
                           channels: int) -> jnp.ndarray:
    """Per-color-channel standardization of a descriptor set (paper
    protocol): subtract the channel mean and divide by the channel std,
    computed over all patches and spatial positions of THIS set. Removes
    trivial brightness/contrast differences so the distance measures
    structure."""
    d = desc.reshape(desc.shape[0], size * size, channels)
    mean = jnp.mean(d, axis=(0, 1), keepdims=True)
    std = jnp.std(d, axis=(0, 1), keepdims=True) + 1e-8
    return ((d - mean) / std).reshape(desc.shape)


@partial(jax.jit, static_argnames=("dir_repeats", "dirs_per_repeat"))
def sliced_wasserstein(a: jnp.ndarray, b: jnp.ndarray, key: jax.Array,
                       dir_repeats: int = 4,
                       dirs_per_repeat: int = 128) -> jnp.ndarray:
    """Sliced Wasserstein-1 between two equally-sized descriptor clouds
    (N, D): mean over random unit directions of the 1-D W1 distance
    (|sorted projection difference|). Exact-zero when a == b.

    The projection is one (N, D) @ (D, P) matmul per repeat — MXU work —
    and the per-direction sort runs as P independent lanes. Repeats are a
    ``lax.map`` so the compiled program is one fixed-shape loop.
    """
    assert a.shape == b.shape and a.ndim == 2

    def one_repeat(k):
        dirs = jax.random.normal(k, (a.shape[1], dirs_per_repeat), a.dtype)
        dirs = dirs / (jnp.linalg.norm(dirs, axis=0, keepdims=True) + 1e-12)
        pa = jnp.sort(a @ dirs, axis=0)
        pb = jnp.sort(b @ dirs, axis=0)
        return jnp.mean(jnp.abs(pa - pb))

    keys = jax.random.split(key, dir_repeats)
    return jnp.mean(jax.lax.map(one_repeat, keys))


def _n_levels(resolution: int, min_res: int) -> int:
    """Number of pyramid levels spanning min_res..resolution (>=1)."""
    n = 1
    while resolution // 2 ** (n - 1) > min_res:
        n += 1
    return n


def swd_levels(resolution: int, min_res: int = 16) -> list[int]:
    """The per-level resolutions swd() reports, finest first."""
    return [resolution // 2 ** i
            for i in range(_n_levels(resolution, min_res))]


def swd(reals, fakes, key=None, *, nhoods_per_image: int = 128,
        nhood_size: int = 7, dir_repeats: int = 4,
        dirs_per_repeat: int = 128, min_res: int = 16,
        minibatch: int = 64) -> dict:
    """Full SWD protocol between two NHWC image sets of identical shape.

    Returns ``{resolution: distance_x1e3, ..., "avg": mean_x1e3}`` with one
    entry per pyramid level (finest first), values multiplied by 1e3 per the
    paper's reporting convention. ``minibatch`` bounds device memory: images
    stream through pyramid+patch extraction in fixed-size chunks (one
    compiled program reused for every chunk), and only the (N*nhoods, D)
    descriptor clouds persist. Patch positions use common random numbers
    across the two sets and fold the global image index, so the score is
    exactly 0 for identical sets and independent of ``minibatch`` (see
    module docstring).

    Both sets should share the training dynamic range ([-1, 1]); the
    per-channel descriptor normalization removes global gain/offset anyway.
    """
    reals = np.asarray(reals, np.float32)
    fakes = np.asarray(fakes, np.float32)
    assert reals.shape == fakes.shape and reals.ndim == 4, (
        reals.shape, fakes.shape)
    if key is None:
        key = jax.random.PRNGKey(0)
    n, h, w, c = reals.shape
    assert n % minibatch == 0 or n < minibatch, (
        f"num images {n} must be a multiple of minibatch {minibatch} "
        f"(or smaller) so every chunk reuses one compiled program")
    if min_res < nhood_size:
        raise ValueError(
            f"min_res ({min_res}) must be >= nhood_size ({nhood_size}): the "
            f"coarsest pyramid level must fit at least one patch")
    if min(h, w) < min_res:
        raise ValueError(
            f"images are {h}x{w} but the SWD protocol needs at least "
            f"min_res x min_res ({min_res}x{min_res}); evaluate a snapshot "
            f"of resolution >= {min_res}, or lower min_res (>= nhood_size "
            f"{nhood_size})")
    minibatch = min(minibatch, n)
    n_levels = _n_levels(min(h, w), min_res)

    k_patch, k_dirs = jax.random.split(key)

    def descriptors(images):
        per_level = [[] for _ in range(n_levels)]
        for i in range(0, n, minibatch):
            img_keys = jax.vmap(
                lambda j: jax.random.fold_in(k_patch, j)
            )(jnp.arange(i, i + minibatch, dtype=jnp.uint32))
            chunk = _chunk_descriptors(images[i:i + minibatch], img_keys,
                                       n_levels, nhoods_per_image, nhood_size)
            for lv, patches in enumerate(chunk):
                per_level[lv].append(patches)
        return [_normalize_descriptors(jnp.concatenate(ps, axis=0),
                                       nhood_size, c) for ps in per_level]

    dr = descriptors(reals)
    df = descriptors(fakes)  # same k_patch: identical positions by design
    results = {}
    for lv in range(n_levels):
        dist = sliced_wasserstein(dr[lv], df[lv],
                                  jax.random.fold_in(k_dirs, lv),
                                  dir_repeats, dirs_per_repeat)
        res = min(h, w) // 2 ** lv
        results[res] = float(dist) * 1e3
    results["avg"] = float(np.mean([v for kk, v in results.items()
                                    if kk != "avg"]))
    return results
