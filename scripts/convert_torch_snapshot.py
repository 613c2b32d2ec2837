"""Convert a reference (deepsound-project/pggan-pytorch) torch snapshot into
this framework's snapshot format.

The reference checkpoints entire live ``nn.Module`` objects with
``torch.save`` (reference plugins.py:158-166, resumed at train.py:60-64);
those pickles are bound to the reference's code tree and torch version. This
tool lets a user migrate mid-experiment: it unpickles the module (with the
reference source dir on sys.path so ``network.Generator`` etc. resolve),
extracts the weights, and writes a ``pggan_tpu`` snapshot readable by
``--resume_network`` / ``generate`` / ``eval``.

    python scripts/convert_torch_snapshot.py \
        --torch_snapshot results/000-exp/network-snapshot-generator-001200.dat \
        --reference_dir /path/to/pggan-pytorch \
        --out network-snapshot-generator-001200.dat

Exactness: the reference's equalized-LR constant is the *empirical* RMS of
the kaiming init (``c = sqrt(mean(w**2))``, reference network.py:19) while
this framework uses the closed-form He constant. The converter folds each
layer's saved ``c`` into the exported weight (``w_ours = w_torch * c / he``)
so the converted network's forward pass is exactly the torch module's —
verified by tests/test_convert_torch_snapshot.py, which round-trips a
reference-structured module and compares outputs at several (depth, alpha).

Layout mapping: torch conv weights are OIHW, ours HWIO; ``nn.Linear`` is
(out, in), ours (in, out). fmap_base/fmap_max are inferred back from the
observed channel schedule (exact for fmap_decay == 1.0 configs, the
reference default; otherwise a warning is printed — the parameters stay
exact either way, only re-init metadata is approximate).
"""

from __future__ import annotations

import argparse
import math
import sys

import numpy as np


def _he(fan_in: int) -> float:
    return math.sqrt(2.0) / math.sqrt(fan_in)


def _conv_params(pgconv) -> dict:
    """PGConv2d -> {'w': HWIO, 'b': (out,)} with the module's empirical
    wscale constant folded in (see module docstring)."""
    w = pgconv.conv.weight.detach().cpu().numpy()  # (out, in, kh, kw)
    b = pgconv.conv.bias.detach().cpu().numpy()
    c = float(pgconv.c)
    kh, kw, ch_in = w.shape[2], w.shape[3], w.shape[1]
    scale = c / _he(kh * kw * ch_in)
    return {"w": np.ascontiguousarray(
        w.transpose(2, 3, 1, 0) * np.float32(scale)),
        "b": np.ascontiguousarray(b)}


def _is_lrelu(pgconv) -> bool:
    return type(getattr(pgconv, "act", None)).__name__ == "LeakyReLU"


def _infer_fmaps(ch_by_stage: dict) -> tuple[int, int, bool]:
    """Back out (fmap_base, fmap_max) from observed per-stage channels,
    assuming the reference default fmap_decay=1.0
    (nf(s) = min(fmap_base / 2**s, fmap_max), reference network.py:94-95).
    Returns (base, max, exact)."""
    fmap_max = max(ch_by_stage.values())
    below = [c * 2 ** s for s, c in ch_by_stage.items() if c < fmap_max]
    fmap_base = max(below) if below else fmap_max
    exact = all(min(int(fmap_base / 2.0 ** s), fmap_max) == c
                for s, c in ch_by_stage.items())
    return fmap_base, fmap_max, exact


def convert_generator(module):
    """torch Generator (reference network.py:75-139) -> (Generator, params)."""
    from pggan_tpu.models import Generator

    blocks = list(module.blocks)
    R = len(blocks) + 2
    num_channels = module.block0.toRGB.conv.out_channels
    ch = {1: module.block0.c2.conv.out_channels}
    for j, b in enumerate(blocks):
        ch[j + 2] = b.c2.conv.out_channels
    fmap_base, fmap_max, exact = _infer_fmaps(ch)
    if not exact:
        print("WARNING: channel schedule does not match fmap_decay=1.0; "
              "converted params are exact but the snapshot's fmap_base/"
              "fmap_max metadata is approximate", file=sys.stderr)
    G = Generator(
        dataset_shape=(1, num_channels, 2 ** R, 2 ** R),
        fmap_base=fmap_base, fmap_max=fmap_max,
        latent_size=int(module.latent_size),
        normalize_latents=bool(getattr(module, "normalize_latents", True)),
        wscale=True,  # the constant is folded into the weights either way
        pixelnorm=bool(module.block0.c1.pixelnorm),
        leakyrelu=_is_lrelu(module.block0.c1),
    )
    params = {
        "block0": {"c1": _conv_params(module.block0.c1),
                   "c2": _conv_params(module.block0.c2),
                   "torgb": _conv_params(module.block0.toRGB)},
        "blocks": tuple(
            {"c1": _conv_params(b.c1), "c2": _conv_params(b.c2),
             "torgb": _conv_params(b.toRGB)} for b in blocks),
    }
    return G, params


def convert_discriminator(module):
    """torch Discriminator (reference network.py:190-240) ->
    (Discriminator, params)."""
    from pggan_tpu.models import Discriminator

    blocks = list(module.blocks)
    R = len(blocks) + 1
    num_channels = blocks[0].fromRGB.conv.in_channels
    # blocks run stage R-1 .. 2 (DBlock) then the 4x4 DLastBlock
    ch = {0: blocks[-1].c2.conv.out_channels,
          1: blocks[-1].c1.conv.out_channels}
    for j, b in enumerate(blocks[:-1]):
        ch[R - 1 - j] = b.c1.conv.in_channels
    fmap_base, fmap_max, exact = _infer_fmaps(ch)
    if not exact:
        print("WARNING: channel schedule does not match fmap_decay=1.0; "
              "converted params are exact but the snapshot's fmap_base/"
              "fmap_max metadata is approximate", file=sys.stderr)
    D = Discriminator(
        dataset_shape=(1, num_channels, 2 ** R, 2 ** R),
        fmap_base=fmap_base, fmap_max=fmap_max,
        wscale=True,
        pixelnorm=bool(blocks[0].c1.pixelnorm),
        leakyrelu=_is_lrelu(blocks[0].c1),
    )
    linear_w = module.linear.weight.detach().cpu().numpy()  # (1, nf0)
    linear_b = module.linear.bias.detach().cpu().numpy()
    params = {
        "blocks": tuple(
            {"fromrgb": _conv_params(b.fromRGB),
             "c1": _conv_params(b.c1),
             "c2": _conv_params(b.c2)} for b in blocks),
        "linear": {"w": np.ascontiguousarray(linear_w.T),
                   "b": np.ascontiguousarray(linear_b)},
    }
    return D, params


def convert(torch_snapshot: str, out: str,
            reference_dir: str | None = None) -> str:
    """Load the torch pickle and write a pggan_tpu snapshot; returns the
    detected model kind ('generator'/'discriminator')."""
    import torch

    from pggan_tpu.checkpoint import save_snapshot
    if reference_dir:
        sys.path.insert(0, reference_dir)
    try:
        module = torch.load(torch_snapshot, map_location="cpu",
                            weights_only=False)
    finally:
        if reference_dir:
            sys.path.remove(reference_dir)
    kind = type(module).__name__.lower()
    if "generator" in kind:
        model, params = convert_generator(module)
        kind = "generator"
    elif "discriminator" in kind:
        model, params = convert_discriminator(module)
        kind = "discriminator"
    else:
        raise SystemExit(f"unrecognized module class {type(module).__name__};"
                         f" expected the reference Generator/Discriminator")
    depth = int(getattr(module, "depth", 0))
    alpha = float(getattr(module, "alpha", 1.0))
    save_snapshot(out, model, params, depth=depth, alpha=alpha)
    print(f"Converted {kind} (depth {depth}, alpha {alpha}) -> {out}")
    return kind


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--torch_snapshot", required=True,
                   help="reference network-snapshot-*.dat (torch pickle)")
    p.add_argument("--out", required=True,
                   help="output pggan_tpu snapshot path")
    p.add_argument("--reference_dir", default="",
                   help="directory containing the reference's network.py "
                        "(needed to unpickle its module classes)")
    args = p.parse_args(argv)
    convert(args.torch_snapshot, args.out, args.reference_dir or None)


if __name__ == "__main__":
    main()
