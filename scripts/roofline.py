#!/usr/bin/env python
"""Roofline floors for the fused WGAN-GP train step, per depth.

Compiles (does NOT run) the paper-config stable-phase step for each
requested depth on the attached TPU and prints the XLA cost-analysis
totals alongside the analytic floors:

    bytes floor = bytes accessed / HBM streaming bandwidth
    flops floor = f32 MXU flops / f32-via-bf16x3 throughput

The step floor is max(bytes, flops) — the step cannot run faster than its
slower resource. Measured HLO self-times (scripts/profile_step.py) sit
beside these floors in BASELINE.md; floor/self-time is the remaining
headroom. Bandwidth/compute constants are the v5e numbers measured in
round 2 (BASELINE.md: ~800 GiB/s streaming on large arrays, ~66 TFLOP/s
f32-via-bf16x3; the MXU peak is 197 TFLOP/s bf16).

Usage: python scripts/roofline.py [depth ...]   (default: 5 6 7 8)
"""

import sys

import numpy as np

HBM_GIBS = 800.0  # GiB/s, measured streaming BW (BASELINE.md)
F32_TFLOPS = 66.0  # f32-via-bf16x3 effective MXU throughput
BF16_TFLOPS = 197.0  # v5e peak, for reference

MINIBATCH = {d: 16 for d in range(9)}
MINIBATCH.update({6: 14, 7: 6, 8: 3})


def main():
    import jax

    from pggan_tpu.models import Discriminator, Generator
    from pggan_tpu.training.state import init_state, make_optimizer
    from pggan_tpu.training.steps import TrainStepBuilder

    shape = (1, 3, 1024, 1024)
    G, D = Generator(shape), Discriminator(shape)
    opt = make_optimizer()
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    state = init_state(G.init(keys[0]), D.init(keys[1]), opt, keys[2])
    builder = TrainStepBuilder(G, D, opt)

    depths = [int(a) for a in sys.argv[1:]] or [5, 6, 7, 8]
    print(f"device: {jax.devices()[0]}", flush=True)
    print("depth  res  batch |  GB accessed  TFLOP |"
          "  bytes-floor  flops-floor  step-floor (ms)")
    for depth in depths:
        batch = MINIBATCH[depth]
        step = builder.step_fn(depth, batch, fade=False)
        reals = np.zeros(builder.real_batch_shape(depth, batch), np.float32)
        alpha, lr = np.float32(1.0), np.float32(1e-4)
        compiled = step.lower(state, reals, alpha, lr, lr).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):  # older jax returns [dict]
            ca = ca[0]
        gb = ca.get("bytes accessed", 0.0) / 2**30
        tf = ca.get("flops", 0.0) / 1e12
        t_bytes = gb / HBM_GIBS * 1e3
        t_flops = tf / F32_TFLOPS * 1e3
        print(f"{depth:>5} {4 * 2 ** depth:>4} {batch:>6} | {gb:>11.2f} "
              f"{tf:>6.2f} | {t_bytes:>11.1f} {t_flops:>11.1f} "
              f"{max(t_bytes, t_flops):>10.1f}", flush=True)


if __name__ == "__main__":
    main()
