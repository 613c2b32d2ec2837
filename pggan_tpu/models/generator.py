"""Progressive-growing Generator, TPU-native.

Mirrors the reference architecture (network.py:44-139) as a pure-functional
JAX model: a model *definition* object holds the static configuration and
exposes ``init(key) -> params`` and ``apply(params, z, depth, alpha) -> imgs``
where ``depth`` is a **static** Python int (each depth is its own XLA graph —
the progressive-growing stage transition is a recompilation boundary) and
``alpha`` is a **traced** scalar (fade-in progress changes every iteration
without recompiling).

Differences from the reference, by design (TPU-first):
- NHWC layout (reference: NCHW).
- The fade-in blend ``(1-alpha)*prev_rgb + alpha*rgb`` (network.py:131-138) is
  always computed, with ``alpha`` traced; at alpha==1 it equals the stable
  graph, so the fade and stable phases share one compiled graph per depth.
- The prev-stage ``toRGB`` is applied to the *upsampled features* exactly as
  the reference does (network.py:127-135), preserving its quirk (1x1 conv
  commutes with nearest upsample, so this matches Karras' formulation).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from pggan_tpu.ops.primitives import (
    conv_init,
    equalized_conv2d,
    equalized_conv2d_up2x,
    nf,
    pixelnorm,
    upsample_nearest_2x,
)


def _block_init(key, ch_in, ch_out, num_channels, first, wscale, dtype):
    """One G stage: two convs + its own toRGB (network.py:44-72)."""
    k1, k2, k3 = jax.random.split(key, 3)
    c1_ksize = 4 if first else 3
    return {
        "c1": conv_init(k1, c1_ksize, ch_in, ch_out, wscale, dtype),
        "c2": conv_init(k2, 3, ch_out, ch_out, wscale, dtype),
        "torgb": conv_init(k3, 1, ch_out, num_channels, wscale, dtype),
    }


@dataclass
class Generator:
    """Latent -> image generator (reference network.py:75-139).

    ``dataset_shape`` follows the reference convention (N, C, H, W): the last
    dim is the full output resolution, dim 1 the channel count
    (network.py:88-89).
    """

    dataset_shape: tuple
    fmap_base: int = 4096
    fmap_decay: float = 1.0
    fmap_max: int = 512
    latent_size: int | None = 512
    normalize_latents: bool = True
    wscale: bool = True
    pixelnorm: bool = True
    leakyrelu: bool = True
    compute_dtype: str = "float32"  # 'bfloat16' halves HBM traffic (MXU-rate)
    fused_scale: bool = True  # fuse upsample into the stage conv (exact)
    pallas_tail: bool = True  # spatial-lanes Pallas convs for the high-res tail
    # SERVING-ONLY: fuse each tail block's conv pair into one Pallas kernel
    # whose intermediate never touches HBM (ops/pallas_chain.py). The fused
    # kernel is forward-only (no AD rules) — training through it fails
    # loudly. Set by the sampling/serving entry points, never by train.
    inference_chain: bool = False
    dtype: object = field(default=jnp.float32, repr=False)

    # Pallas-tail envelope: which growth stages join the NHCW tail is
    # single-sourced in ops/spatial.py (stage_in_envelope;
    # PGGAN_PALLAS_MAX_CIN / _HI tune the profile-placed channel boundary).
    # set by TrainStepBuilder when training over a device mesh (see
    # ops/spatial.py shard_map_batch)
    mesh = None
    batch_axis = "data"

    def __post_init__(self):
        self._compute = (jnp.bfloat16
                         if str(self.compute_dtype) in ("bfloat16", "bf16")
                         else None)
        resolution = int(self.dataset_shape[-1])
        self.num_channels = int(self.dataset_shape[1])
        self.R = int(math.log2(resolution))
        assert resolution == 2 ** self.R and resolution >= 4, \
            "resolution must be a power of two >= 4 (network.py:92)"
        if self.latent_size is None:
            self.latent_size = self.nf(0)
        self.max_depth = self.R - 2  # len(blocks) in the reference (network.py:116)
        self.eps = 1e-8

    # -- static schedule ----------------------------------------------------
    def nf(self, stage: int) -> int:
        return nf(stage, self.fmap_base, self.fmap_decay, self.fmap_max)

    def resolution_at(self, depth: int) -> int:
        return 4 * (2 ** depth)

    @property
    def act(self) -> str:
        return "lrelu" if self.leakyrelu else "relu"

    # -- params -------------------------------------------------------------
    def init(self, key: jax.Array) -> dict:
        keys = jax.random.split(key, self.max_depth + 1)
        block0 = _block_init(keys[0], self.latent_size, self.nf(1),
                             self.num_channels, True, self.wscale, self.dtype)
        blocks = tuple(
            _block_init(keys[i - 1], self.nf(i - 1), self.nf(i),
                        self.num_channels, False, self.wscale, self.dtype)
            for i in range(2, self.R)
        )
        return {"block0": block0, "blocks": blocks}

    # -- forward ------------------------------------------------------------
    def _conv(self, p, x, *, ksize, pad, use_pixelnorm=None, act="default"):
        return equalized_conv2d(
            p, x, padding=pad, wscale=self.wscale,
            act=self.act if act == "default" else act,
            use_pixelnorm=self.pixelnorm if use_pixelnorm is None else use_pixelnorm,
            eps=self.eps,
            compute_dtype=self._compute,
        )

    def _block(self, p, h, first: bool):
        h = self._conv(p["c1"], h, ksize=4 if first else 3, pad=3 if first else 1)
        h = self._conv(p["c2"], h, ksize=3, pad=1)
        return h

    def _block_up(self, p, h):
        """Growth-stage block with the 2x upsample fused into c1: never
        materializes the upsampled tensor (ops/primitives.py fused-scale).
        Exactly equivalent to ``_block(upsample_nearest_2x(h))``."""
        h = equalized_conv2d_up2x(
            p["c1"], h, wscale=self.wscale, act=self.act,
            use_pixelnorm=self.pixelnorm, eps=self.eps,
            compute_dtype=self._compute)
        h = self._conv(p["c2"], h, ksize=3, pad=1)
        return h

    def _torgb(self, p, h):
        return self._conv(p["torgb"], h, ksize=1, pad=0,
                          use_pixelnorm=False, act=None)

    # -- spatial-lanes (NHCW/Pallas) tail ------------------------------------
    def _pallas_tail_start(self, depth: int):
        """First growth-stage index handled by the NHCW spatial-lanes tail,
        or None. Stage i convolves at 2**(i+3) px with nf(i+1) input
        channels. Resolution grows and channels shrink with i, but the
        Mosaic %8 channel-alignment requirement can disqualify an arbitrary
        later stage, so qualification is NOT monotone — the scan below
        returns the start of the longest contiguous suffix of qualifying
        stages (the tail must reach the output). f32 only."""
        if not self.pallas_tail or self._compute is not None or depth < 1:
            return None
        def ok(i):
            # stage i convolves nf(i+1) -> nf(i+2) channels at 2**(i+3) px;
            # the envelope law is single-sourced in ops/spatial.py. Every
            # tail stage uses the entry tier: G's channels shrink as its
            # resolution grows, so the continuation relaxation D needs
            # (entry=False) can never admit an extra G stage.
            from pggan_tpu.ops.spatial import stage_in_envelope
            return stage_in_envelope(2 ** (i + 3), self.nf(i + 1),
                                     self.nf(i + 2))

        start = None
        for i in reversed(range(depth)):  # every stage i..depth-1 must pass
            if not ok(i):
                break
            start = i
        return start

    def _pallas_tail(self, params, h_nhwc, depth, alpha, fade, start):
        """Growth stages ``start .. depth-1`` + toRGB (+ fade blend) in NHCW
        with Pallas 3x3 convs. The fused-scale dilated conv is replaced by
        an explicit nearest upsample (the broadcast fuses with the conv's
        pad into one XLA pass) — bit-equal to the reference's non-fused
        formulation (network.py:127-129). Returns NHWC RGB at res(depth),
        f32, matching ``apply``'s output contract."""
        from pggan_tpu.ops import spatial

        blocks = params["blocks"]

        def stage(v, p):
            v = spatial.upsample_nearest_2x(v)
            if (self.inference_chain and self.act == "lrelu"
                    and spatial.chain_pair_supported(v.shape, p["c1"],
                                                     p["c2"])):
                # serving-only fused conv pair: the intermediate activation
                # never round-trips HBM (forward-only, see inference_chain)
                return spatial.conv3x3_block_pair(
                    p["c1"], p["c2"], v, wscale=self.wscale,
                    use_pixelnorm=self.pixelnorm, eps=self.eps)
            v = spatial.conv3x3_block(p["c1"], v, wscale=self.wscale,
                                   act=self.act,
                                   use_pixelnorm=self.pixelnorm, eps=self.eps)
            return spatial.conv3x3_block(p["c2"], v, wscale=self.wscale,
                                      act=self.act,
                                      use_pixelnorm=self.pixelnorm,
                                      eps=self.eps)

        def torgb(v, p):
            return spatial.conv1x1(p["torgb"], v, wscale=self.wscale, act=None,
                                use_pixelnorm=False, eps=self.eps)

        h = h_nhwc.transpose(0, 1, 3, 2).astype(jnp.float32)  # -> NHCW
        for i in range(start, depth - 1):
            h = stage(h, blocks[i])
        if fade:
            # prev-stage toRGB of the pre-final features, then upsample
            # (1x1 commutes with nearest upsample — reference order,
            # network.py:129-135)
            prev_p = blocks[depth - 2] if depth > 1 else params["block0"]
            prev_rgb = spatial.upsample_nearest_2x(torgb(h, prev_p))
        ult = torgb(stage(h, blocks[depth - 1]), blocks[depth - 1])
        if fade:
            a = jnp.asarray(alpha, jnp.float32)
            ult = prev_rgb * (1.0 - a) + ult * a
        return ult.transpose(0, 1, 3, 2)  # -> NHWC images

    def _pallas_tail_fn(self, depth, fade, start, batch_size):
        from pggan_tpu.ops.spatial import shard_map_batch

        def tail(p, hh, aa):
            return self._pallas_tail(p, hh, depth, aa, fade, start)

        return shard_map_batch(tail, self.mesh, self.batch_axis,
                               n_array_args=1, batch_size=batch_size)

    def apply(self, params: dict, z: jax.Array, depth: int,
              alpha: jax.Array | float, fade: bool = True) -> jax.Array:
        """Forward pass at a static ``depth`` (reference network.py:118-139).

        z: (N, latent_size); returns NHWC images at ``4 * 2**depth``.

        ``fade`` statically selects the graph variant: with ``fade=False``
        the prev-stage toRGB and the blend are omitted entirely (the
        reference's ``preult_rgb = 0`` stable-phase branch,
        network.py:136-137) — at alpha==1 both variants are equal, but the
        stable graph never pays the full-resolution blend path.
        """
        if not (0 <= depth <= self.max_depth):
            raise ValueError(f"depth {depth} out of range [0, {self.max_depth}]")
        h = z.reshape(z.shape[0], 1, 1, z.shape[-1]).astype(self.dtype)
        if self.normalize_latents:
            h = pixelnorm(h, self.eps)
        h = self._block(params["block0"], h, first=True)
        if depth == 0:
            return self._torgb(params["block0"], h).astype(jnp.float32)
        tail = self._pallas_tail_start(depth)
        if tail is not None:
            # low-res NHWC stages, then the NHCW spatial-lanes tail (Pallas
            # convs; includes the final stage, toRGB and the fade blend)
            for i in range(tail):
                h = (self._block_up(params["blocks"][i], h)
                     if self.fused_scale else
                     self._block(params["blocks"][i],
                                 upsample_nearest_2x(h), first=False))
            tail_fn = self._pallas_tail_fn(depth, fade, tail, h.shape[0])
            return tail_fn(params, h, jnp.asarray(alpha, jnp.float32))
        prev_p = params["blocks"][depth - 2] if depth > 1 else params["block0"]
        if self.fused_scale:
            for i in range(depth - 1):
                h = self._block_up(params["blocks"][i], h)
            ult = self._block_up(params["blocks"][depth - 1], h)
            ult = self._torgb(params["blocks"][depth - 1], ult)
            if fade:
                # toRGB (1x1) commutes exactly with nearest upsample: apply
                # at low res then upsample — same values, 1/4 the conv work
                # (reference order: network.py:129-135).
                prev_rgb = upsample_nearest_2x(self._torgb(prev_p, h))
        else:
            for i in range(depth - 1):
                h = upsample_nearest_2x(h)
                h = self._block(params["blocks"][i], h, first=False)
            h = upsample_nearest_2x(h)
            ult = self._block(params["blocks"][depth - 1], h, first=False)
            ult = self._torgb(params["blocks"][depth - 1], ult)
            if fade:
                prev_rgb = self._torgb(prev_p, h)
        ult = ult.astype(jnp.float32)  # images and the blend stay f32
        if not fade:
            return ult
        prev_rgb = prev_rgb.astype(jnp.float32)
        alpha = jnp.asarray(alpha, jnp.float32)
        return prev_rgb * (1.0 - alpha) + ult * alpha

    def num_params(self, params: dict) -> int:
        return sum(x.size for x in jax.tree_util.tree_leaves(params))
