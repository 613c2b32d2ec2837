"""Standalone inference/sampling entry point (reference generate.py).

Loads a generator snapshot, draws latents, runs the jitted forward at the
snapshot's (depth, alpha), and pipes NCHW numpy output through the
configured postprocessors:

    python -m pggan_tpu.cli.generate \
        --generator_path results/001-exp/network-snapshot-generator-003000.dat \
        --num_samples 6 --postprocessors "['ImageSaver']"
"""

from __future__ import annotations

from argparse import ArgumentParser
from functools import partial

import numpy as np

import jax

import pggan_tpu.postprocess as postprocess_module
from pggan_tpu.checkpoint import load_snapshot
from pggan_tpu.utils.config import (
    add_class_args,
    generic_arg_parse,
    get_all_classes,
    get_structured_params,
)
from pggan_tpu.sampling import sample_images
from pggan_tpu.utils.misc import enable_persistent_compilation_cache

default_params = {
    "generator_path": "",   # a snapshot path, or 'latest' (see result_dir)
    "result_dir": "results",  # search root for --generator_path latest
    "num_samples": 6,
    "minibatch": 0,  # 0 = one forward (reference parity); k = serve chunks
    "postprocessors": [],
    "description": "unknown",
    "random_seed": 0,
    "inference_chain": True,  # fused conv-pair serving kernels, default ON:
                              # +9%/+14.5% img/s at depths 7/8 with bitwise
                              # parity (BASELINE.md round-5 A/B); per-stage
                              # auto-fallback to the plain pair on shapes the
                              # kernel can't take (ops/pallas_chain.py)
}


def output_samples(generator_path, num_samples, postprocessors, description,
                   random_seed=0, result_dir="results", minibatch=0,
                   inference_chain=True):
    enable_persistent_compilation_cache()
    from pggan_tpu.checkpoint import resolve_generator_path
    generator_path = resolve_generator_path(generator_path, result_dir)
    print(f"Loading {generator_path}")
    G, params, meta = load_snapshot(generator_path)
    if inference_chain:
        G.inference_chain = True  # serving-only fused conv pairs
    n_dev = jax.device_count()
    print(f"Generating ({n_dev} device{'s' if n_dev > 1 else ''}, "
          f"minibatch {minibatch or num_samples})...")
    rng = np.random.RandomState(random_seed)
    out = sample_images(G, params, meta["depth"], meta["alpha"], num_samples,
                        minibatch=minibatch, rng=rng)
    out = out.transpose(0, 3, 1, 2)  # -> NCHW for the postprocessors
    print("Done.")
    for proc in postprocessors:
        print(f"Outputting for postprocessor: {proc}")
        proc(out, description)
    print("Done.")
    return out


def cli_main(argv=None):
    parser = ArgumentParser(description=__doc__)
    flat_defaults = dict(default_params)
    for k in default_params:
        parser.add_argument(
            f"--{k}",
            type=partial(generic_arg_parse, hinttype=type(default_params[k])))
    add_class_args(parser, get_all_classes(postprocess_module),
                   default_params=flat_defaults)
    parser.set_defaults(**flat_defaults)
    params = get_structured_params(vars(parser.parse_args(argv)))
    postprocessors = [getattr(postprocess_module, x)(**params.get(x, {}))
                      for x in params["postprocessors"]]
    output_samples(params["generator_path"], params["num_samples"],
                   postprocessors, params["description"],
                   params["random_seed"], params["result_dir"],
                   params["minibatch"], params["inference_chain"])


if __name__ == "__main__":
    cli_main()
