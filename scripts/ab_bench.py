#!/usr/bin/env python
"""Steady-state A/B benchmark harness for the fused train step.

Methodology (see BASELINE.md): the attached runtime pipelines many dispatches
deeply, so short loops measure dispatch, not execution. Each measurement
therefore runs long rounds and DISCARDS the first (pipeline absorption);
reported numbers are the mean of the remaining rounds. Only same-process
interleaved comparisons are meaningful.

Usage: ab_bench.py CONFIG [CONFIG ...] where CONFIG is
``name:depth,batch[,dtype[,fused[,fade[,pallas]]]]`` e.g. ``f32:5,16``
``bf16:5,16,bfloat16`` ``noplas:8,3,float32,true,false,false``.
"""

import sys
import time

import numpy as np


def build(depth, batch, dtype="float32", fused=True, pallas=True):
    import jax
    from pggan_tpu.models import Discriminator, Generator
    from pggan_tpu.training.state import init_state, make_optimizer
    from pggan_tpu.training.steps import TrainStepBuilder

    shape = (1, 3, 1024, 1024)
    G = Generator(shape, compute_dtype=dtype, fused_scale=fused)
    D = Discriminator(shape, compute_dtype=dtype, fused_scale=fused,
                      pallas_tail=pallas)
    opt = make_optimizer()
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    state = init_state(G.init(ks[0]), D.init(ks[1]), opt, ks[2])
    b = TrainStepBuilder(G, D, opt)
    reals = np.random.RandomState(0).randn(
        *b.real_batch_shape(depth, batch)).astype(np.float32)
    return b, state, reals


def measure(entries, iters=40, rounds=3):
    import jax
    lr = np.float32(1e-4)
    alpha = np.float32(1.0)
    results = {name: [] for name, *_ in entries}
    states = {}
    steps = {}
    for name, depth, batch, dtype, fused, fade, pallas in entries:
        b, state, reals = build(depth, batch, dtype, fused, pallas)
        steps[name] = (b.step_fn(depth, batch, fade), reals)
        states[name] = state
    # compile + flush pipeline (data fetch is the only reliable sync:
    # block_until_ready returns before remote execution completes)
    for name, *_ in entries:
        step, reals = steps[name]
        for _ in range(3):
            states[name], m = step(states[name], reals, alpha, lr, lr)
        float(m["D_loss"])
    for rnd in range(rounds):
        line = []
        for name, *_ in entries:
            step, reals = steps[name]
            t0 = time.perf_counter()
            for _ in range(iters):
                states[name], m = step(states[name], reals, alpha, lr, lr)
            float(m["D_loss"])
            dt = (time.perf_counter() - t0) / iters * 1000
            if rnd > 0:  # round 0 absorbs the dispatch pipeline
                results[name].append(dt)
            line.append(f"{name} {dt:8.2f} ms")
        tag = "(discarded)" if rnd == 0 else ""
        print(" | ".join(line), tag, flush=True)
    print("--- steady state (mean of rounds 2..):")
    for name, vals in results.items():
        if vals:
            print(f"{name}: {np.mean(vals):8.2f} ms/step", flush=True)
    return {k: float(np.mean(v)) for k, v in results.items() if v}


def measure_serial(entries, iters=40, rounds=3):
    """A/B/A for programs too big to co-reside in HBM (two full depth-8
    grad-of-grad programs + states OOM the shared v5e chip): measure each
    config to steady state, then FREE all its device buffers before building
    the next. The first config is re-measured last — if its two readings
    disagree materially, the chip was drifting and the comparison is void.
    Same-process, so the usual >30% trust bar still applies (CLAUDE.md)."""
    import gc

    import jax
    lr = np.float32(1e-4)
    alpha = np.float32(1.0)
    seq = list(entries) + [entries[0]]
    results = []
    for pos, (name, depth, batch, dtype, fused, fade, pallas) in \
            enumerate(seq):
        b, state, reals = build(depth, batch, dtype, fused, pallas)
        step = b.step_fn(depth, batch, fade)
        for _ in range(3):
            state, m = step(state, reals, alpha, lr, lr)
        float(m["D_loss"])
        vals = []
        for rnd in range(rounds):
            t0 = time.perf_counter()
            for _ in range(iters):
                state, m = step(state, reals, alpha, lr, lr)
            float(m["D_loss"])
            dt = (time.perf_counter() - t0) / iters * 1000
            if rnd > 0:
                vals.append(dt)
            print(f"[{pos}] {name} {dt:8.2f} ms"
                  + (" (discarded)" if rnd == 0 else ""), flush=True)
        results.append((name, float(np.mean(vals))))
        del state, m, b, step, reals  # free device buffers + executable
        gc.collect()
        jax.clear_caches()
    print("--- serial steady state:")
    for name, v in results:
        print(f"{name}: {v:8.2f} ms/step", flush=True)
    a0, a1 = results[0][1], results[-1][1]
    drift = abs(a1 - a0) / min(a0, a1)
    print(f"drift check: {results[0][0]} measured {a0:.2f} then {a1:.2f} "
          f"ms/step ({drift * 100:.1f}% apart)", flush=True)
    return results


def parse(cfg):
    name, rest = cfg.split(":")
    parts = rest.split(",")
    depth, batch = int(parts[0]), int(parts[1])
    dtype = parts[2] if len(parts) > 2 else "float32"
    fused = parts[3].lower() != "false" if len(parts) > 3 else True
    fade = parts[4].lower() == "true" if len(parts) > 4 else False
    pallas = parts[5].lower() != "false" if len(parts) > 5 else True
    return (name, depth, batch, dtype, fused, fade, pallas)


if __name__ == "__main__":
    iters = int(sys.argv[sys.argv.index("--iters") + 1]) \
        if "--iters" in sys.argv else 40
    cfgs = [a for a in sys.argv[1:] if ":" in a]
    if "--serial" in sys.argv:
        measure_serial([parse(c) for c in cfgs], iters=iters)
    else:
        measure([parse(c) for c in cfgs], iters=iters)
