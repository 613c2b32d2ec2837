#!/usr/bin/env python
"""Is the spatial-lanes conv kernel DMA-bound or MXU-issue-bound?

Round-2/3 profiles put the Pallas kernels at ~2x their DMA floor
(BASELINE.md). Before attacking, this probe separates the two candidate
limiters at the hot depth-8 shapes by timing three kernel variants on chip:

  full     — the shipped kernel (halo DMA + merged-tap dots)
  dma-only — same grid + double-buffered halo DMA, dots skipped (the
             output block gets a trivial slab-dependent write)
  mxu-only — same grid + dots from the resident slab, halo DMA skipped

Per-variant numbers are HLO self-time of the custom-call rows only
(tenancy-robust), printed beside the bytes floor (in+out traffic at the
~800 GiB/s streaming BW measured for XLA fusions on this chip).

Usage: PYTHONPATH=.:/root/.axon_site python scripts/kernel_bound_probe.py
"""

import sys
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pggan_tpu.ops.pallas_conv import (
    _fetch_halo_slab,
    _pick_th,
    _taps,
    _weights_3k3c,
)
from pggan_tpu.utils.profiling import capture_hlo_stats

REPS = 10
STREAM_GIBS = 800.0


def _fetch_halo_slab_split(x_hbm, slab, sem, n, t, *, N, T, TH, H, W,
                           ways):
    """Like _fetch_halo_slab but each window is fetched with ``ways``
    parallel async copies (W split into lane chunks), probing whether
    multiple DMA issues per window raise the achieved HBM rate."""
    cw = W // ways

    def emit(slot, n_, t_, action):
        def dma(src_lo, rows, dst_lo):
            for i in range(ways):
                d = pltpu.make_async_copy(
                    x_hbm.at[n_, pl.ds(src_lo, rows), :,
                             pl.ds(i * cw, cw)],
                    slab.at[slot, pl.ds(dst_lo, rows), :,
                            pl.ds(128 + i * cw, cw)],
                    sem.at[slot, i])
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

    step = n * T + t
    slot = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        slab[...] = jnp.zeros_like(slab)
        emit(0, n, t, "start")

    @pl.when(step < N * T - 1)
    def _():
        nxt = jax.lax.rem(step + 1, 2)
        emit(nxt, jax.lax.div(step + 1, T), jax.lax.rem(step + 1, T),
             "start")

    emit(slot, n, t, "wait")

    @pl.when(t == 0)
    def _():
        slab[slot, 0:1] = jnp.zeros_like(slab[slot, 0:1])

    @pl.when(t == T - 1)
    def _():
        slab[slot, TH + 1:TH + 2] = jnp.zeros_like(slab[slot, TH + 1:TH + 2])
    return slot


def _probe_kernel(x_hbm, wt_ref, y_ref, slab, sem, *, C, K, TH, W, H, N,
                  mode):
    n = pl.program_id(0)
    t = pl.program_id(1)
    if mode in ("full", "dma"):
        slot = _fetch_halo_slab(x_hbm, slab, sem, n, t,
                                N=N, T=H // TH, TH=TH, H=H, W=W)
    elif mode.startswith("split"):
        slot = _fetch_halo_slab_split(x_hbm, slab, sem, n, t,
                                      N=N, T=H // TH, TH=TH, H=H, W=W,
                                      ways=int(mode[5:]))
    else:  # mxu: no DMA — compute from whatever the slab holds
        slot = jax.lax.rem(n * (H // TH) + t, 2)

    merged = C % 8 == 0
    for r in range(TH):
        if mode == "dma":
            # trivial slab-dependent write so neither the halo DMA nor the
            # output block can be dead-code-eliminated
            y_ref[0, r] = jnp.broadcast_to(
                slab[slot, r, :1, 128:128 + W], (K, W))
            continue
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
        y_ref[0, r] = acc


def probe(n, h, c, w_dim, k, mode, th=None):
    th = th or _pick_th(h, c, k, w_dim)
    sem_shape = (2, int(mode[5:])) if mode.startswith("split") else (2,)
    fn = pl.pallas_call(
        partial(_probe_kernel, C=c, K=k, TH=th, W=w_dim, H=h, N=n,
                mode=mode),
        out_shape=jax.ShapeDtypeStruct((n, h, k, w_dim), jnp.float32),
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, k, 3 * c), lambda n_, t_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, k, w_dim),
                               lambda n_, t_: (n_, t_, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, c, w_dim + 256), jnp.float32),
            pltpu.SemaphoreType.DMA(sem_shape),
        ],
    )
    return jax.jit(lambda x, wt: fn(x, wt))


def self_time_ms(run_fn, reps):
    rows = capture_hlo_stats(run_fn)
    us = sum((d.get("Total self time (us)") or 0) for d in rows
             if d.get("HLO op category") == "custom-call")
    return us / (reps * 1e3)


def main():
    shapes = [
        # (N, H, C, W, K) — depth-8 span members (D stages + G tail) and the
        # GP's doubled-batch variants
        (3, 1024, 16, 1024, 16),
        (6, 1024, 16, 1024, 16),
        (3, 1024, 8, 1024, 16),
        (6, 512, 32, 512, 32),
        (3, 512, 32, 512, 32),
    ]
    rng = np.random.RandomState(0)
    for (n, h, c, w_dim, k) in shapes:
        x = jnp.asarray(rng.randn(n, h, c, w_dim).astype(np.float32))
        wt = jnp.asarray(
            _weights_3k3c((rng.randn(3, 3, c, k) * 0.05).astype(np.float32)))
        bytes_io = (n * h * c * w_dim + n * h * k * w_dim) * 4
        floor_ms = bytes_io / (STREAM_GIBS * 2 ** 30) * 1e3
        line = [f"({n},{h},{c},{w_dim})->K{k} floor {floor_ms:6.3f} ms"]
        for mode in ("full", "dma", "mxu", "split2", "split4"):
            f = probe(n, h, c, w_dim, k, mode)
            r = f(x, wt)
            float(jnp.sum(r[0, 0, :1, :8]))  # sync

            def run():
                out = None
                for _ in range(REPS):
                    out = f(x, wt)
                float(jnp.sum(out[0, 0, :1, :8]))

            ms = self_time_ms(run, REPS)
            line.append(f"{mode} {ms:6.3f}")
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
