"""AOT export: freeze a generator snapshot into a StableHLO artifact.

The reference has no deployment story at all — serving means importing the
training code and unpickling a live ``nn.Module`` (/root/reference/
generate.py:27-40), which ties every consumer to the exact torch + source
tree that produced the checkpoint. The TPU-native equivalent is ahead-of-
time export: ``jax.export`` lowers the jitted generator forward (params
baked in as constants) to a versioned, serialized StableHLO program that
any JAX runtime — or anything else that speaks StableHLO — can execute
without this package, Python model code, or pickle.

Artifact layout (``<out>.stablehlo`` + ``<out>.json``):

- the bytes from ``jax.export.Exported.serialize()`` — self-contained:
  weights, the (batch, latent) -> NHWC image program, and the calling
  convention version;
- a JSON sidecar describing the frozen program (depth/alpha/resolution/
  batch/platforms/jax version) so serving infra can route requests
  without deserializing first.

The program takes a single ``(batch, latent_size) float32`` argument and
returns ``(batch, H, W, C) float32``; ``batch`` is frozen at export time
(one compiled shape — the serving pattern ``sampling.py`` already uses).
Passing ``batch <= 0`` instead exports a *polymorphic* batch (the symbolic
dimension ``b``): one artifact serves any batch size.

Artifacts always take the generator's pure-XLA graph (``pallas_tail`` is
stripped): Pallas lowers either to Mosaic custom calls (not in StableHLO's
compatibility surface, and tied to the producing libtpu) or — on a non-TPU
host — to the *interpret-mode emulation*, which would silently bake an
orders-of-magnitude-slower program into a cross-lowered TPU artifact. The
in-process serving path (``sampling.py``) keeps the Pallas envelope; AOT
trades it for a portable, future-proof program.
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

import jax
from jax import export as jax_export


def export_generator(G, params, depth, alpha, batch, *, platforms=None):
    """Lower ``G.apply`` at (depth, alpha) to a ``jax.export.Exported``.

    ``params`` are closed over — the artifact is self-contained.
    ``platforms`` is a sequence like ``("tpu",)`` / ``("cpu", "tpu")``;
    None exports for the current default backend. ``batch <= 0`` exports
    with a symbolic batch dimension ``b``. The Pallas tail is stripped
    (portable pure-XLA graph, same values — see module docstring);
    ``alpha == 1`` additionally takes the fade-free graph.
    """
    alpha = np.float32(alpha)
    if getattr(G, "pallas_tail", False):
        G = dataclasses.replace(G, pallas_tail=False)
    # stable snapshots never pay the full-res prev-toRGB + blend path
    fade = bool(alpha < 1.0)

    def forward(z):
        return G.apply(params, z, depth, alpha, fade=fade)

    if int(batch) <= 0:
        shape = jax_export.symbolic_shape(f"b, {G.latent_size}")
    else:
        shape = (int(batch), G.latent_size)
    z_spec = jax.ShapeDtypeStruct(shape, np.float32)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jax_export.export(jax.jit(forward), **kwargs)(z_spec)


def save_exported(exported, out_path: str, meta: dict) -> tuple[str, str]:
    """Serialize ``exported`` to ``out_path`` (+ ``.json`` sidecar).

    Returns ``(artifact_path, sidecar_path)``.
    """
    if not out_path.endswith(".stablehlo"):
        out_path = out_path + ".stablehlo"
    blob = exported.serialize()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    tmp = out_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, out_path)

    sidecar = os.path.splitext(out_path)[0] + ".json"
    info = dict(meta)
    info.update({
        "format": "jax.export serialized StableHLO",
        "calling_convention_version":
            int(exported.calling_convention_version),
        "platforms": list(exported.platforms),
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        "jax_version": jax.__version__,
        "artifact_bytes": len(blob),
    })
    with open(sidecar + ".tmp", "w") as f:
        json.dump(info, f, indent=1, sort_keys=True)
    os.replace(sidecar + ".tmp", sidecar)
    return out_path, sidecar


def load_exported(path: str):
    """Deserialize an artifact; run it with ``.call(z)``."""
    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())
