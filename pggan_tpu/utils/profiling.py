"""HLO self-time capture — the tenancy-robust measurement instrument.

The shared TPU chip's wall-clock step times vary up to ~19x with tenancy
(BASELINE.md measurement rules); per-op device-busy self-time from a
profiled run survives that interleaving, so it is the decision instrument
of record (CLAUDE.md). Used by scripts/profile_step.py for breakdowns and
by bench.py to put the capability number on the record next to the wall
measurement.
"""

from __future__ import annotations

import collections
import glob
import json
import os
import tempfile


def capture_hlo_stats(run_fn, out_dir: str | None = None) -> list[dict]:
    """Profile ``run_fn()`` on device and return per-op hlo_stats rows
    (label -> value dicts, incl. "Total self time (us)")."""
    import jax

    # each capture gets a FRESH directory even under an explicit out_dir:
    # the glob below must only ever see this run's trace — summing a stale
    # .xplane.pb from an earlier capture in the same directory would inflate
    # the self-time instrument of record
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        trace_dir = tempfile.mkdtemp(prefix="capture_", dir=out_dir)
    else:
        trace_dir = tempfile.mkdtemp(prefix="pggan_prof_")
    jax.profiler.start_trace(trace_dir)
    try:
        run_fn()
    finally:
        # the profiler session is process-global: leaving it running after a
        # run_fn failure (e.g. a tunnel drop mid-probe) would poison every
        # later capture with "trace already being taken"
        jax.profiler.stop_trace()
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    from xprof.convert import raw_to_tool_data as r
    data, _ = r.xspace_to_tool_data(paths, "hlo_stats", {})
    tab = json.loads(data.decode() if isinstance(data, bytes) else data)
    cols = [c["label"] for c in tab["cols"]]
    return [dict(zip(cols, [c.get("v") for c in row["c"]]))
            for row in tab["rows"]]


def self_time_ms_per_step(run_fn, n_steps: int,
                          out_dir: str | None = None) -> float:
    """Total HLO self-time per step (ms) of ``n_steps`` profiled steps."""
    rows = capture_hlo_stats(run_fn, out_dir)
    total_us = sum((d.get("Total self time (us)") or 0) for d in rows)
    return total_us / (n_steps * 1e3)


def summarize(rows: list[dict], n_steps: int, top: int = 25) -> None:
    """Print the category/bound/top-op breakdown (profile_step.py output)."""
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
    rows = sorted(rows, key=lambda d: -(d.get("Total self time (us)") or 0))
    for d in rows[:top]:
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
