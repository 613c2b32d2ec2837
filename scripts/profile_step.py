#!/usr/bin/env python
"""Capture and summarize a device profile of the fused train step.

Runs N profiled steps at a given (depth, batch), writes the xplane trace, and
prints the HLO self-time breakdown by op category and boundedness (HBM /
compute) using the installed xprof tooling — the workflow that produced the
round-1 findings in BASELINE.md.

Usage: PYTHONPATH=.:/root/.axon_site python scripts/profile_step.py \
           [depth] [batch] [out_dir] [--no-pallas] [--bf16] [--group=N]

--group=N profiles the grouped-dispatch program (N steps scanned into one
compiled program, the Trainer's default stable-phase path) instead of the
single-step program; reported numbers stay per STEP.

HLO self-time sums are per-op device-busy time, so unlike wall-clock steps
they survive the shared chip's tenancy noise (CLAUDE.md measurement rules);
comparing the totals of two profiled runs is the decision procedure when
interleaved A/B drifts too much.
"""

import sys
import tempfile

import numpy as np


def main():
    from pggan_tpu.utils.misc import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()  # remote compiles are minutes; cache across runs
    pallas = "--no-pallas" not in sys.argv
    fuse = "--no-fuse" not in sys.argv
    dtype = "bfloat16" if "--bf16" in sys.argv else "float32"
    group = next((int(a.split("=", 1)[1]) for a in sys.argv
                  if a.startswith("--group=")), 1)
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    depth = int(pos[0]) if len(pos) > 0 else 8
    batch = int(pos[1]) if len(pos) > 1 else 3
    out_dir = pos[2] if len(pos) > 2 else tempfile.mkdtemp(
        prefix="pggan_prof_")

    if not fuse:
        import os
        os.environ["PGGAN_FUSE_EPILOGUE"] = "0"

    import jax
    from pggan_tpu.models import Discriminator, Generator
    from pggan_tpu.training.state import init_state, make_optimizer
    from pggan_tpu.training.steps import TrainStepBuilder
    from pggan_tpu.utils.profiling import capture_hlo_stats, summarize

    shape = (1, 3, 1024, 1024)
    G = Generator(shape, compute_dtype=dtype, pallas_tail=pallas)
    D = Discriminator(shape, compute_dtype=dtype, pallas_tail=pallas)
    print(f"config: depth={depth} batch={batch} pallas={pallas} "
          f"dtype={dtype} fuse={fuse}", flush=True)
    opt = make_optimizer()
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    state = init_state(G.init(ks[0]), D.init(ks[1]), opt, ks[2])
    b = TrainStepBuilder(G, D, opt)
    if group > 1:
        gstep = b.group_step_fn(depth, batch, fade=False, group=group)
        reals = jax.device_put(np.random.RandomState(0).randn(
            group, *b.real_batch_shape(depth, batch)).astype(np.float32))
        av = jax.device_put(np.full((group,), 1.0, np.float32))
        lv = jax.device_put(np.full((group,), 1e-4, np.float32))

        def step(st, r, a_, ld, lg):
            st, ms = gstep(st, reals, av, lv, lv)
            return st, {"D_loss": ms["D_loss"][-1]}
    else:
        step = b.step_fn(depth, batch, fade=False)
    reals_1 = np.random.RandomState(0).randn(
        *b.real_batch_shape(depth, batch)).astype(np.float32)
    a, lr = np.float32(1.0), np.float32(1e-4)
    for _ in range(3):
        state, m = step(state, reals_1, a, lr, lr)
    float(m["D_loss"])

    n_disp = 5

    def run():
        nonlocal state
        for _ in range(n_disp):
            state, m = step(state, reals_1, a, lr, lr)
        float(m["D_loss"])

    rows = capture_hlo_stats(run, out_dir)
    summarize(rows, n_disp * group)


if __name__ == "__main__":
    main()
