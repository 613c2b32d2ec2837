#!/usr/bin/env python
"""Same-session A/B: NHCW envelope channel ceiling 64 vs 128 (VERDICT r4 #5).

Depths 6-8 sit 1.3-1.5x above their (over-counted) byte floors; the
remaining structural seam is where the spatial-lanes span ends and the
graph pays an NHCW->NHWC copy. Raising the CONTINUATION ceiling
(PALLAS_MAX_CIN_HI) from 64 to 128 pulls each depth's 128px C=128 block
into the span: the seam moves from the 128px boundary (C=128 tensor) to
the 64px boundary (C=256 tensor, HALF the bytes), at the risk that the
C=128 Pallas convs lose to XLA's already-lane-efficient NHWC convs there
(the depth-5 entry lesson, BASELINE round-3).

Measures HLO self-time of the stable lone step at the requested depths,
ceiling 64 -> 128 -> 64 again (drift guard), in ONE process per the
CLAUDE.md measurement rules.

Usage: PYTHONPATH=.:/root/.axon_site python scripts/ab_envelope_hi.py \
           [depths, default "6,7,8"] [batches, default "14,6,3"]
"""

import sys

import numpy as np


def main():
    depths = [int(x) for x in
              (sys.argv[1] if len(sys.argv) > 1 else "6,7,8").split(",")]
    batches = [int(x) for x in
               (sys.argv[2] if len(sys.argv) > 2 else "14,6,3").split(",")]

    import jax
    from pggan_tpu.utils.misc import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    import pggan_tpu.ops.spatial as spatial
    from pggan_tpu.models import Discriminator, Generator
    from pggan_tpu.training.state import init_state, make_optimizer
    from pggan_tpu.training.steps import TrainStepBuilder
    from pggan_tpu.utils.profiling import self_time_ms_per_step

    shape = (1, 3, 1024, 1024)  # paper config
    opt = make_optimizer()

    def measure(tag, depth, batch, hi):
        spatial.PALLAS_MAX_CIN_HI = hi
        G = Generator(shape)
        D = Discriminator(shape)
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        state = init_state(G.init(ks[0]), D.init(ks[1]), opt, ks[2])
        reals = jax.device_put(np.random.RandomState(0).randn(
            1, batch, 4 * 2 ** depth, 4 * 2 ** depth, 3).astype(np.float32))
        s, lr = np.float32(1.0), np.float32(1e-4)
        step = TrainStepBuilder(G, D, opt).step_fn(depth, batch, fade=False)
        m = None
        for _ in range(2):  # compile + pipeline absorption
            state, m = step(state, reals, s, lr, lr)
        float(np.asarray(m["D_loss"]).ravel()[-1])
        n = 24

        def run():
            nonlocal state, m
            for _ in range(n):
                state, m = step(state, reals, s, lr, lr)
            float(np.asarray(m["D_loss"]).ravel()[-1])

        ms = self_time_ms_per_step(run, n)
        print(f"depth {depth} b{batch} HI={hi:3d} {tag:12s}: "
              f"{ms:7.2f} ms/step self-time", flush=True)
        return ms

    for depth, batch in zip(depths, batches):
        base = measure("baseline", depth, batch, 64)
        wide = measure("C<=128", depth, batch, 128)
        base2 = measure("re-baseline", depth, batch, 64)
        drift = abs(base2 - base)
        print(f"depth {depth}: C128 - C64 = {wide - base:+.2f} ms/step "
              f"(drift band {drift:.2f})\n", flush=True)


if __name__ == "__main__":
    main()
