#!/usr/bin/env python
"""Capture and summarize a device profile of the fused train step.

Runs N profiled steps at a given (depth, batch), writes the xplane trace, and
prints the HLO self-time breakdown by op category and boundedness (HBM /
compute) using the installed xprof tooling — the workflow that produced the
round-1 findings in BASELINE.md.

Usage: PYTHONPATH=.:/root/.axon_site python scripts/profile_step.py \
           [depth] [batch] [out_dir] [--no-pallas] [--bf16]

HLO self-time sums are per-op device-busy time, so unlike wall-clock steps
they survive the shared chip's tenancy noise (CLAUDE.md measurement rules);
comparing the totals of two profiled runs is the decision procedure when
interleaved A/B drifts too much.
"""

import collections
import glob
import json
import os
import sys
import tempfile

import numpy as np


def main():
    pallas = "--no-pallas" not in sys.argv
    dtype = "bfloat16" if "--bf16" in sys.argv else "float32"
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    depth = int(pos[0]) if len(pos) > 0 else 8
    batch = int(pos[1]) if len(pos) > 1 else 3
    out_dir = pos[2] if len(pos) > 2 else tempfile.mkdtemp(
        prefix="pggan_prof_")

    import jax
    from pggan_tpu.models import Discriminator, Generator
    from pggan_tpu.training.state import init_state, make_optimizer
    from pggan_tpu.training.steps import TrainStepBuilder

    shape = (1, 3, 1024, 1024)
    G = Generator(shape, compute_dtype=dtype, pallas_tail=pallas)
    D = Discriminator(shape, compute_dtype=dtype, pallas_tail=pallas)
    print(f"config: depth={depth} batch={batch} pallas={pallas} "
          f"dtype={dtype}", flush=True)
    opt = make_optimizer()
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    state = init_state(G.init(ks[0]), D.init(ks[1]), opt, ks[2])
    b = TrainStepBuilder(G, D, opt)
    step = b.step_fn(depth, batch, fade=False)
    reals = np.random.RandomState(0).randn(
        *b.real_batch_shape(depth, batch)).astype(np.float32)
    a, lr = np.float32(1.0), np.float32(1e-4)
    for _ in range(3):
        state, m = step(state, reals, a, lr, lr)
    float(m["D_loss"])

    n_steps = 5
    jax.profiler.start_trace(out_dir)
    for _ in range(n_steps):
        state, m = step(state, reals, a, lr, lr)
    float(m["D_loss"])
    jax.profiler.stop_trace()

    paths = glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                      recursive=True)
    print(f"trace: {paths}")
    from xprof.convert import raw_to_tool_data as r
    data, _ = r.xspace_to_tool_data(paths, "hlo_stats", {})
    tab = json.loads(data.decode() if isinstance(data, bytes) else data)
    cols = [c["label"] for c in tab["cols"]]
    rows = [dict(zip(cols, [c.get("v") for c in row["c"]]))
            for row in tab["rows"]]
    bycat, bybound = collections.Counter(), collections.Counter()
    for d in rows:
        t = d.get("Total self time (us)") or 0
        bycat[d.get("HLO op category") or "?"] += t
        bybound[d.get("Bound by") or "?"] += t
    total = sum(bycat.values())
    print(f"total self time: {total / 1e3:.1f} ms over {n_steps} steps "
          f"-> {total / (n_steps * 1e3):.1f} ms/step")
    print("--- by category:")
    for cat, t in bycat.most_common(12):
        print(f"{t / total * 100:5.1f}%  {cat}")
    print("--- by bound:")
    for bnd, t in bybound.most_common(8):
        print(f"{t / total * 100:5.1f}%  {bnd}")
    print("--- top ops by self time:")
    rows.sort(key=lambda d: -(d.get("Total self time (us)") or 0))
    for d in rows[:25]:
        t = d.get("Total self time (us)") or 0
        fw = (d.get("Framework op name") or "").replace(
            "jit(step)/", "").replace("while/body/closed_call/", "W/")[:90]
        txt = d.get("HLO op text") or ""
        shape = txt.split(" = ")[1][:55] if " = " in txt else ""
        bw = d.get("Measured memory BW (GiB/s)")
        bw = f"{float(bw):.0f}" if bw not in (None, "") else "?"
        print(f"{t / total * 100:5.1f}%  {t / (n_steps * 1e3):7.2f} ms/step  "
              f"bw={bw:>5}  {d.get('HLO op category'):>18}  {fw}")
        if shape:
            print(f"         {shape}")


if __name__ == "__main__":
    main()
