#!/usr/bin/env python
"""Same-session A/B: grouped-dispatch scan ROLLED vs UNROLLED vs lone step.

Measures HLO self-time (ms/step) of the depth-5 headline config three ways
in ONE process — the chip's clock drifts across sessions (CLAUDE.md
measurement rules), so only a same-process comparison can attribute the
rolled scan's carry-threading cost:

  1. lone step        (step_fn, no scan)
  2. grouped, rolled  (group_step_fn, lax.scan unroll=1 — the default)
  3. grouped, unrolled(group_step_fn, lax.scan unroll=group via
                       PGGAN_GROUP_UNROLL; ~group x compile time)

Usage: PYTHONPATH=.:/root/.axon_site python scripts/ab_group_unroll.py \
           [depth] [batch] [group]
"""

import os
import sys

import numpy as np


def main():
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    group = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import jax
    from pggan_tpu.utils.misc import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()  # remote compiles are minutes; cache across runs
    from pggan_tpu.models import Discriminator, Generator
    from pggan_tpu.training.state import init_state, make_optimizer
    from pggan_tpu.training.steps import TrainStepBuilder
    from pggan_tpu.utils.profiling import self_time_ms_per_step

    shape = (1, 3, 1024, 1024)  # paper config
    G = Generator(shape)
    D = Discriminator(shape)
    opt = make_optimizer()
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    state = init_state(G.init(ks[0]), D.init(ks[1]), opt, ks[2])

    reals1 = jax.device_put(np.random.RandomState(0).randn(
        1, batch, 4 * 2 ** depth, 4 * 2 ** depth, 3).astype(np.float32))
    realsg = jax.device_put(np.random.RandomState(0).randn(
        group, 1, batch, 4 * 2 ** depth, 4 * 2 ** depth, 3
        ).astype(np.float32))
    ones = jax.device_put(np.ones((group,), np.float32))
    s = np.float32(1.0)     # alpha (stable phase)
    lr = np.float32(1e-4)   # lr=1.0 would blow the threaded state to NaN

    def measure(tag, fn, n_dispatch, steps_per_dispatch):
        # state buffers are DONATED by every step program: always rebind
        nonlocal state
        m = None
        for _ in range(2):  # warmup: compile + pipeline absorption
            state, m = fn(state)
        float(np.asarray(m["D_loss"]).ravel()[-1])  # the only reliable sync

        def run():
            nonlocal state, m
            for _ in range(n_dispatch):
                state, m = fn(state)
            float(np.asarray(m["D_loss"]).ravel()[-1])

        ms = self_time_ms_per_step(run, n_dispatch * steps_per_dispatch)
        print(f"{tag:24s}: {ms:7.2f} ms/step self-time", flush=True)
        return ms

    # 1. lone step
    step = TrainStepBuilder(G, D, opt).step_fn(depth, batch, fade=False)
    lone = measure("lone step", lambda st: step(st, reals1, s, lr, lr),
                   n_dispatch=3 * group, steps_per_dispatch=1)

    # 2. grouped rolled (fresh builder; env decides unroll at build time)
    os.environ["PGGAN_GROUP_UNROLL"] = "1"
    gs_rolled = TrainStepBuilder(G, D, opt).group_step_fn(
        depth, batch, fade=False, group=group)
    rolled = measure(
        "grouped scan (rolled)",
        lambda st: gs_rolled(st, realsg, ones, ones * 1e-4, ones * 1e-4),
        n_dispatch=3, steps_per_dispatch=group)

    # 3. grouped unrolled
    os.environ["PGGAN_GROUP_UNROLL"] = str(group)
    gs_unrolled = TrainStepBuilder(G, D, opt).group_step_fn(
        depth, batch, fade=False, group=group)
    unrolled = measure(
        "grouped scan (unrolled)",
        lambda st: gs_unrolled(st, realsg, ones, ones * 1e-4, ones * 1e-4),
        n_dispatch=3, steps_per_dispatch=group)

    # re-measure the lone step LAST: if the chip clock drifted during the
    # run (co-tenant DVFS, CLAUDE.md), lone2 != lone and the A/B deltas
    # must be read against that drift band, not as kernel effects
    lone2 = measure("lone step (re-measure)",
                    lambda st: step(st, reals1, s, lr, lr),
                    n_dispatch=3 * group, steps_per_dispatch=1)

    drift = abs(lone2 - lone)
    print(f"\nintra-session clock drift band:      {drift:.2f} ms/step")
    print(f"scan carry cost (rolled - lone):     {rolled - lone:+.2f} ms/step")
    print(f"unroll recovers (rolled - unrolled): {rolled - unrolled:+.2f} "
          f"ms/step")
    print("verdict: effects inside the drift band are NOT attributable "
          "to the scan/unroll.")


if __name__ == "__main__":
    main()
