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
import pickle

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)


def _atomic_dump(payload, path: str) -> None:
    """Write-then-rename so a crash mid-pickle never leaves a truncated
    checkpoint at the final name."""
    import os
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
