"""Checkpointing: self-contained model snapshots + full train-state saves.

The reference pickles entire live ``nn.Module`` objects (plugins.py:158-166)
— brittle across code versions and silently missing optimizer/RNG state
(SURVEY.md §5). Here snapshots are plain dicts of numpy arrays plus the
constructor config needed to rebuild the model — stable, inspectable, and
complete: ``training-state-*.dat`` carries both Adam states, the PRNG key
and the nimg/iteration clocks, so resume is exact.

File naming mirrors the reference layout so its UX carries over:
``network-snapshot-{generator|discriminator}-{kimg:06}.dat``
(plugins.py:144,163-165).
"""

from __future__ import annotations

import dataclasses
import os
import pickle

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)


def _atomic_dump(payload, path: str) -> None:
    """Write-then-rename so a crash mid-pickle never leaves a truncated
    checkpoint at the final name."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)


def model_config(model) -> dict:
    """Constructor kwargs for rebuilding a Generator/Discriminator."""
    cfg = {}
    for f in dataclasses.fields(model):
        if f.name == "dtype":
            continue
        cfg[f.name] = getattr(model, f.name)
    # latent_size may have been resolved from None (network.py:97-98);
    # persist the resolved value.
    if hasattr(model, "latent_size"):
        cfg["latent_size"] = model.latent_size
    return cfg


def save_snapshot(path: str, model, params, depth: int, alpha: float) -> None:
    payload = {
        "framework": "pggan_tpu",
        "format_version": 1,
        "model_class": type(model).__name__,
        "config": model_config(model),
        "params": _to_numpy(params),
        "depth": int(depth),
        "alpha": float(alpha),
    }
    _atomic_dump(payload, path)


def load_snapshot(path: str):
    """Returns (model, params, meta) with the model rebuilt from its saved
    config."""
    from pggan_tpu.models import Discriminator, Generator
    with open(path, "rb") as f:
        payload = pickle.load(f)
    classes = {"Generator": Generator, "Discriminator": Discriminator}
    model = classes[payload["model_class"]](**payload["config"])
    meta = {k: payload[k] for k in ("depth", "alpha", "model_class")}
    return model, payload["params"], meta


def snapshot_kimg(path: str) -> int:
    """kimg encoded in a snapshot filename; -1 when absent. The single
    source of truth for the ``...-{kimg:06}.dat`` suffix (used by train's
    resume-latest, generate/eval's latest resolution, and eval history)."""
    import re
    m = re.search(r"-(\d+)\.dat$", path)
    return int(m.group(1)) if m else -1


def ema_twin(path: str) -> str | None:
    """Path of the ``generator-ema`` twin of a plain generator snapshot if
    one exists on disk, else None."""
    ema = path.replace("network-snapshot-generator-",
                       "network-snapshot-generator-ema-")
    return ema if ema != path and os.path.exists(ema) else None


def resolve_generator_path(path: str, result_dir: str = "results",
                           prefer_ema: bool = True) -> str:
    """Resolve ``--generator_path latest`` for the generate/eval CLIs: the
    newest run directory under ``result_dir`` (by snapshot mtime), then the
    highest kimg inside it — the same rule as train's ``--resume_network
    latest`` (cli/train.py find_latest_snapshot), minus the discriminator
    pairing inference doesn't need. When a ``generator-ema`` twin of the
    winner exists and ``prefer_ema``, the smoothed snapshot is returned (it
    is the one Karras-style sampling should consume). Non-'latest' paths
    pass through unchanged."""
    if path != "latest":
        return path
    import glob
    cands = [p for p in glob.glob(
        os.path.join(result_dir, "**", "network-snapshot-generator-*.dat"),
        recursive=True) if "-generator-ema-" not in p]
    if not cands:
        raise SystemExit(f"--generator_path latest: no generator snapshots "
                         f"under {result_dir}")
    by_dir = {}
    for p in cands:
        by_dir.setdefault(os.path.dirname(p), []).append(p)
    run_dir = max(by_dir, key=lambda d: max(map(os.path.getmtime, by_dir[d])))
    best = max(by_dir[run_dir], key=snapshot_kimg)
    if prefer_ema:
        ema = ema_twin(best)
        if ema:
            return ema
    return best


def save_training_state(path: str, state, cur_nimg: int, iterations: int,
                        base_time: float = 0.0) -> None:
    payload = {
        "framework": "pggan_tpu",
        "format_version": 1,
        "state": _to_numpy(state),
        "cur_nimg": int(cur_nimg),
        "iterations": int(iterations),
        "base_time": float(base_time),
    }
    _atomic_dump(payload, path)


def load_training_state(path: str):
    """Returns (TrainState-with-numpy-leaves, cur_nimg, iterations,
    base_time) where ``base_time`` is the cumulative training wall-clock in
    seconds at save time — fed back into ``AbsoluteTimeMonitor`` on resume so
    the ``time`` stat continues instead of restarting at zero."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    return (payload["state"], payload["cur_nimg"], payload["iterations"],
            float(payload.get("base_time", 0.0)))
