"""Export a generator snapshot to a serialized StableHLO serving artifact.

The reference's only deployment path is re-importing the training code and
unpickling live modules (/root/reference/generate.py:27-40). Here a
snapshot freezes into a self-contained, versioned StableHLO program
(weights baked in) that runs on any JAX runtime without this package:

    python -m pggan_tpu.cli.export \
        --generator_path latest --batch 16 \
        --out exported/generator --platforms "['tpu']" --verify True

Consume it with ``pggan_tpu.export.load_exported(path).call(z)`` — or from
a bare environment::

    from jax import export
    exp = export.deserialize(open("generator.stablehlo", "rb").read())
    images = exp.call(latents)          # (batch, latent) -> (batch,H,W,C)
"""

from __future__ import annotations

from argparse import ArgumentParser
from functools import partial

import numpy as np

import jax

from pggan_tpu.checkpoint import load_snapshot, resolve_generator_path
from pggan_tpu.export import export_generator, load_exported, save_exported
from pggan_tpu.utils.config import generic_arg_parse

default_params = {
    "generator_path": "",    # a snapshot path, or 'latest' (see result_dir)
    "result_dir": "results",
    "out": "exported/generator",
    "batch": 16,             # frozen serving batch; <=0 = polymorphic 'b'
    "platforms": [],         # e.g. ['tpu'] / ['cpu','tpu']; [] = current
    "verify": True,          # round-trip: deserialize, run, compare
}


def export_main(generator_path, out, batch, platforms=(), verify=True,
                result_dir="results"):
    generator_path = resolve_generator_path(generator_path, result_dir)
    print(f"Loading {generator_path}")
    G, params, meta = load_snapshot(generator_path)
    depth, alpha = meta["depth"], meta["alpha"]
    res = 4 * 2 ** depth
    poly = int(batch) <= 0
    if getattr(G, "pallas_tail", False):
        # artifacts always take the portable pure-XLA graph (export.py
        # module docstring); strip here too so the verify reference below
        # is the same program
        import dataclasses
        G = dataclasses.replace(G, pallas_tail=False)
    print(f"Exporting depth {depth} ({res}x{res}), alpha {alpha}, "
          f"batch {'polymorphic (b)' if poly else batch}, "
          f"platforms {list(platforms) or 'default'}")
    exported = export_generator(G, params, depth, alpha, batch,
                                platforms=platforms or None)
    artifact, sidecar = save_exported(exported, out, {
        "source_snapshot": generator_path,
        "depth": int(depth),
        "alpha": float(alpha),
        "resolution": res,
        "batch": "polymorphic" if poly else int(batch),
        "latent_size": int(G.latent_size),
    })
    print(f"Wrote {artifact} + {sidecar}")

    if verify:
        backend = jax.default_backend()
        # jax reports 'gpu' where export platforms say 'cuda'/'rocm'
        compat = {"gpu", "cuda", "rocm"} if backend == "gpu" else {backend}
        can_run = bool(compat & set(exported.platforms))
        if not can_run:
            print(f"Verify: skipped execution (artifact targets "
                  f"{list(exported.platforms)}, host backend is "
                  f"{jax.default_backend()}); serialization round-trip only.")
        loaded = load_exported(artifact)
        if can_run:
            direct = jax.jit(
                lambda zz: G.apply(params, zz, depth, np.float32(alpha),
                                   fade=bool(alpha < 1.0)))
            # a polymorphic artifact must hold at more than one batch size
            for n in ((4, 7) if poly else (batch,)):
                z = np.random.RandomState(n).randn(
                    n, G.latent_size).astype(np.float32)
                got = np.asarray(loaded.call(z))
                want = np.asarray(direct(z))
                err = float(np.max(np.abs(got - want)))
                if not np.allclose(got, want, atol=1e-5):
                    raise SystemExit(
                        f"verify FAILED at batch {n}: max|diff|={err:.3e}")
                print(f"Verify: batch {n} round-trip matches direct apply "
                      f"(max|diff|={err:.3e})")
    return artifact


def cli_main(argv=None):
    parser = ArgumentParser(description=__doc__)
    for k in default_params:
        parser.add_argument(
            f"--{k}",
            type=partial(generic_arg_parse, hinttype=type(default_params[k])))
    parser.set_defaults(**default_params)
    args = vars(parser.parse_args(argv))
    if not args["generator_path"]:
        raise SystemExit("--generator_path is required (a path or 'latest')")
    export_main(args["generator_path"], args["out"], args["batch"],
                args["platforms"], args["verify"], args["result_dir"])


if __name__ == "__main__":
    cli_main()
