"""Progressive-growing Discriminator, TPU-native.

Mirrors the reference architecture (network.py:142-240) as a pure-functional
JAX model. Blocks are stored high-res -> low-res exactly like the reference's
``nn.ModuleList`` (network.py:214-217); the entry block for a given depth is
``blocks[-(depth+1)]`` (network.py:227). ``depth`` is static (one XLA graph
per stage), ``alpha`` is traced.

The minibatch-stddev statistic (network.py:174-187) is a *global-batch*
scalar; expressed as a plain global mean it stays correct under a sharded
batch axis (GSPMD inserts the cross-replica collective).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from pggan_tpu.ops.primitives import (
    avg_pool_2x,
    conv_init,
    dense_init,
    equalized_conv2d,
    equalized_conv2d_pool_in,
    equalized_dense,
    minibatch_stddev,
    nf,
)


@dataclass
class Discriminator:
    """Image -> Wasserstein score critic (reference network.py:190-240)."""

    dataset_shape: tuple
    fmap_base: int = 4096
    fmap_decay: float = 1.0
    fmap_max: int = 512
    wscale: bool = True
    pixelnorm: bool = False
    leakyrelu: bool = True
    compute_dtype: str = "float32"  # 'bfloat16' halves HBM traffic (MXU-rate)
    fused_scale: bool = True  # fuse the fade path's pool into fromRGB (exact)
    pallas_tail: bool = True  # spatial-lanes Pallas convs for the high-res tail
    dtype: object = field(default=jnp.float32, repr=False)

    # Pallas-head envelope: which stages run NHCW is single-sourced in
    # ops/spatial.py (stage_in_envelope; PGGAN_PALLAS_MAX_CIN / _HI tune the
    # profile-placed channel boundary) so the G tail and D head can never
    # diverge when the boundary is re-tuned.
    # set by TrainStepBuilder when training over a device mesh: the NHCW head
    # is wrapped in shard_map over this axis (Pallas kernels are opaque to
    # GSPMD — without it the partitioner would all-gather around them)
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
            "resolution must be a power of two >= 4 (network.py:204)"
        self.max_depth = self.R - 2  # len(blocks) - 1 in the reference (network.py:223)
        self.eps = 1e-8

    def nf(self, stage: int) -> int:
        return nf(stage, self.fmap_base, self.fmap_decay, self.fmap_max)

    def resolution_at(self, depth: int) -> int:
        return 4 * (2 ** depth)

    @property
    def act(self) -> str:
        return "lrelu" if self.leakyrelu else "relu"

    # -- params -------------------------------------------------------------
    def init(self, key: jax.Array) -> dict:
        """Blocks high-res -> low-res: ``DBlock(nf(i), nf(i-1))`` for
        i = R-1 .. 2, then the 4x4 ``DLastBlock(nf(1), nf(0))``
        (network.py:214-217), plus the final linear (network.py:219)."""
        n_blocks = self.R - 1
        keys = jax.random.split(key, n_blocks + 1)
        blocks = []
        for k, i in zip(keys[:-2], range(self.R - 1, 1, -1)):
            k1, k2, k3 = jax.random.split(k, 3)
            blocks.append({
                "fromrgb": conv_init(k1, 1, self.num_channels, self.nf(i),
                                     self.wscale, self.dtype),
                "c1": conv_init(k2, 3, self.nf(i), self.nf(i), self.wscale, self.dtype),
                "c2": conv_init(k3, 3, self.nf(i), self.nf(i - 1), self.wscale, self.dtype),
            })
        k1, k2, k3 = jax.random.split(keys[-2], 3)
        blocks.append({
            "fromrgb": conv_init(k1, 1, self.num_channels, self.nf(1),
                                 self.wscale, self.dtype),
            "c1": conv_init(k2, 3, self.nf(1) + 1, self.nf(1), self.wscale, self.dtype),
            "c2": conv_init(k3, 4, self.nf(1), self.nf(0), self.wscale, self.dtype),
        })
        linear = dense_init(keys[-1], self.nf(0), 1, self.dtype)
        return {"blocks": tuple(blocks), "linear": linear}

    # -- forward ------------------------------------------------------------
    def _conv(self, p, x, *, pad, use_pixelnorm=None, act="default"):
        return equalized_conv2d(
            p, x, padding=pad, wscale=self.wscale,
            act=self.act if act == "default" else act,
            use_pixelnorm=self.pixelnorm if use_pixelnorm is None else use_pixelnorm,
            eps=self.eps,
            compute_dtype=self._compute,
        )

    def _fromrgb(self, p, x):
        # PGConv2d(num_channels, ch, ksize=1, pad=0, pixelnorm=False): act
        # keeps its default (lrelu/relu) — reference network.py:145,160.
        return self._conv(p["fromrgb"], x, pad=0, use_pixelnorm=False)

    # -- spatial-lanes (NHCW/Pallas) head ------------------------------------
    def _stage_ok(self, res: int, ch_in: int, ch_out: int,
                  entry: bool = True) -> bool:
        # the envelope law (incl. the entry-vs-continuation C=64 tiering)
        # lives in ops/spatial.py, shared with the Generator tail
        from pggan_tpu.ops.spatial import stage_in_envelope
        return stage_in_envelope(res, ch_in, ch_out, entry=entry)

    def _pallas_span(self, depth: int) -> int:
        """How many leading stages (entry block + following DBlocks) run on
        the NHCW spatial-lanes path (ops/pallas_conv.py).

        The high-res tail has tiny channel counts that waste NHWC lanes —
        and keeping those stages NHCW *end-to-end* (convs, pool, fade blend)
        also kills the per-conv layout copies that profiles put at ~33% of
        the 1024px step. f32 only; W must be lane-aligned (res % 128 == 0).
        The entry stage runs at res(depth) on nf(depth+1) channels; loop
        stage i runs at res(i-1) on nf(i) channels; the 4x4 last block
        (res 4) never qualifies."""
        if not self.pallas_tail or self._compute is not None or depth == 0:
            return 0
        if not self._stage_ok(self.resolution_at(depth), self.nf(depth + 1),
                              self.nf(depth)):
            return 0
        span = 1
        for i in range(depth, 1, -1):
            if not self._stage_ok(self.resolution_at(i - 1), self.nf(i),
                                  self.nf(i - 1), entry=False):
                break
            span += 1
        return span

    def _pallas_head(self, blocks, x_nhwc, depth, alpha, fade, span):
        """Entry block + fade blend + the next ``span - 1`` DBlocks, computed
        in NHCW with Pallas 3x3 convs (each stage ends in its 2x2 avg-pool).
        Semantics exactly match the NHWC path / reference entry chain
        (network.py:227-238); returns NHWC features at ``res(depth - span)``
        with ``nf(depth - span + 1)`` channels, f32."""
        from pggan_tpu.ops import spatial

        n = len(blocks)

        def conv1x1(v, pp):
            # fromRGB: act, never pixelnorm (reference network.py:145,160)
            return spatial.conv1x1(pp, v, wscale=self.wscale, act=self.act,
                                use_pixelnorm=False, eps=self.eps)

        def conv3(v, pp):
            return spatial.conv3x3_block(pp, v, wscale=self.wscale,
                                      act=self.act,
                                      use_pixelnorm=self.pixelnorm,
                                      eps=self.eps)

        x = x_nhwc.transpose(0, 1, 3, 2).astype(jnp.float32)  # -> NHCW
        p = blocks[n - (depth + 1)]
        h = conv1x1(x, p["fromrgb"])
        h = conv3(h, p["c1"])
        h = conv3(h, p["c2"])
        h = spatial.avg_pool_2x(h)
        if fade:
            # fade-in blend with the next block's fromRGB of the pooled input
            # (network.py:230-233), all in NHCW
            prev = conv1x1(spatial.avg_pool_2x(x), blocks[n - depth]["fromrgb"])
            a = jnp.asarray(alpha, jnp.float32)
            h = h * a + (1.0 - a) * prev
        for i in range(depth, depth - span + 1, -1):
            p = blocks[n - i]
            h = conv3(h, p["c1"])
            h = conv3(h, p["c2"])
            h = spatial.avg_pool_2x(h)
        return h.transpose(0, 1, 3, 2)  # back to NHWC

    def _pallas_head_fn(self, depth, fade, span, batch_size=None):
        """(blocks, x, alpha) -> NHWC features; shard_mapped over the batch
        axis when a mesh is set, because a pallas_call is opaque to GSPMD
        (the partitioner would otherwise all-gather its operands). The head
        is purely per-example, so batch-sharding it is exact."""
        from pggan_tpu.ops.spatial import shard_map_batch

        def head(bp, xx, aa):
            return self._pallas_head(bp, xx, depth, aa, fade, span)

        return shard_map_batch(head, self.mesh, self.batch_axis,
                               n_array_args=1, batch_size=batch_size)

    def _block(self, p, h, is_last: bool, first: bool, stat_groups: int = 1):
        if first:
            h = self._fromrgb(p, h)
        if is_last:
            h = minibatch_stddev(h, groups=stat_groups)  # network.py:168
            h = self._conv(p["c1"], h, pad=1)
            h = self._conv(p["c2"], h, pad=0)  # 4x4 valid -> 1x1 spatial
        else:
            h = self._conv(p["c1"], h, pad=1)
            h = self._conv(p["c2"], h, pad=1)
        return h

    def apply(self, params: dict, x: jax.Array, depth: int,
              alpha: jax.Array | float, fade: bool = True,
              stat_groups: int = 1) -> jax.Array:
        """Forward at static ``depth`` (reference network.py:225-240).

        x: NHWC at resolution ``4 * 2**depth``; returns (N, 1) scores.
        ``fade=False`` statically drops the fromRGB blend path (the
        reference only blends when alpha < 1, network.py:230-233).
        ``stat_groups``: compute the minibatch-stddev statistic over that
        many equal batch slices — ``apply(concat(xs), stat_groups=len(xs))``
        exactly equals ``concat(apply(x) for x in xs)``, which the train
        step uses to score reals and fakes in one fused pass.
        """
        if not (0 <= depth <= self.max_depth):
            raise ValueError(f"depth {depth} out of range [0, {self.max_depth}]")
        blocks = params["blocks"]
        n = len(blocks)
        x = x.astype(self.dtype)
        span = self._pallas_span(depth)
        if span > 0:
            # NHCW spatial-lanes head: entry block, fade blend and the
            # following small-channel DBlocks in one layout, Pallas convs
            head = self._pallas_head_fn(depth, fade, span, x.shape[0])
            h = head(blocks, x, jnp.asarray(alpha, jnp.float32))
            start = depth - span + 1  # head covered loop stages depth..start+1
        else:
            h = self._block(blocks[n - (depth + 1)], x,
                            is_last=(depth == 0), first=True,
                            stat_groups=stat_groups)
            if depth > 0:
                h = avg_pool_2x(h)
            if depth > 0 and fade:
                # fade-in blend with the next block's fromRGB of the
                # downsampled input (network.py:230-233); alpha traced
                # within the fade graph.
                if self.fused_scale:
                    # exact fusion: pool precedes the 1x1 conv, so the mean
                    # commutes into the kernel (ops/primitives.py pool-in)
                    prev = equalized_conv2d_pool_in(
                        blocks[n - depth]["fromrgb"], x, wscale=self.wscale,
                        act=self.act, use_pixelnorm=False, eps=self.eps,
                        compute_dtype=self._compute)
                else:
                    prev = self._fromrgb(blocks[n - depth], avg_pool_2x(x))
                alpha_c = jnp.asarray(alpha, self.dtype)
                h = h * alpha_c + (1.0 - alpha_c) * prev
            start = depth
        for i in range(start, 0, -1):
            h = self._block(blocks[n - i], h, is_last=(i == 1), first=False,
                            stat_groups=stat_groups)
            if i > 1:
                h = avg_pool_2x(h)
        h = h.reshape(h.shape[0], -1)  # squeeze 1x1 spatial -> (N, nf(0))
        return equalized_dense(params["linear"], h.astype(jnp.float32))

    def num_params(self, params: dict) -> int:
        return sum(x.size for x in jax.tree_util.tree_leaves(params))
