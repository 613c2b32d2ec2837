"""Quality evaluation entry point: Sliced Wasserstein Distance between a
generator snapshot's samples and the training distribution.

The reference framework ships no evaluation metric; this CLI adds the
progressive-growing paper's SWD protocol (metrics/swd.py) over the same
snapshot + dataset machinery train/generate use:

    python -m pggan_tpu.cli.eval \
        --generator_path results/001-exp/network-snapshot-generator-003000.dat \
        --dataset_class DefaultImageFolderDataset \
        --DefaultImageFolderDataset.dir_path datasets/images \
        --num_samples 256

Reals are drawn from the dataset at the snapshot's own (depth, alpha) — the
exact distribution the generator was being trained against — so mid-fade
snapshots are scored against mid-fade data. Prints one distance per pyramid
level (finest first, x1e3, lower is better) plus the average, and optionally
writes them as JSON beside the snapshot.

Interpretability: by default (``--real_baseline True``) a SECOND disjoint
sample of reals is scored against the first, giving the real-vs-real floor
of the estimator at this sample size — a generator is only meaningfully
worse than the data to the extent its score exceeds that floor (the paper
reports the same real-vs-real calibration rows in its SWD tables).
"""

from __future__ import annotations

import json
import os
from argparse import ArgumentParser
from functools import partial

import numpy as np

import jax

import pggan_tpu.data.datasets as dataset_module
from pggan_tpu.checkpoint import load_snapshot
from pggan_tpu.metrics.swd import swd
from pggan_tpu.utils.config import (
    add_class_args,
    generic_arg_parse,
    get_all_classes,
    get_structured_params,
)
from pggan_tpu.sampling import sample_images
from pggan_tpu.utils.misc import (
    enable_persistent_compilation_cache,
    load_pkl,
)

default_params = {
    "generator_path": "",   # a snapshot path, or 'latest' (see result_dir)
    "result_dir": "results",  # search root for --generator_path latest
    "run_dir": "",   # history mode: score EVERY snapshot in this run dir
    #               (ema twins preferred) -> eval_history.jsonl curve
    "load_dataset": "",
    "dataset_class": "",
    "num_samples": 256,
    "minibatch": 32,
    "nhoods_per_image": 128,
    "nhood_size": 7,
    "min_res": 16,
    "dir_repeats": 4,
    "dirs_per_repeat": 128,
    "random_seed": 0,
    "real_baseline": True,
    "msssim": True,
    "output_json": "",
}


def _build_dataset(params):
    """Same dataset construction contract as cli/train.py:198-214."""
    if params["load_dataset"]:
        return load_pkl(params["load_dataset"])
    if params["dataset_class"]:
        cls = getattr(dataset_module, params["dataset_class"], None)
        if cls is None:
            names = sorted(c.__name__ for c in get_all_classes(dataset_module))
            raise Exception(f"Unknown dataset_class "
                            f"{params['dataset_class']!r}; available: {names}")
        return cls(**params.get(params["dataset_class"], {}))
    raise Exception("One of either load_dataset (path to pkl) or "
                    "dataset_class needs to be specified.")


def _swd_kwargs(params):
    return dict(nhoods_per_image=params["nhoods_per_image"],
                nhood_size=params["nhood_size"],
                min_res=params["min_res"],
                dir_repeats=params["dir_repeats"],
                dirs_per_repeat=params["dirs_per_repeat"],
                minibatch=params["minibatch"])


def _reals_and_floors(dataset, depth, alpha, params, cache=None):
    """Reals sample + estimator floors for one (depth, alpha) stage:
    ``(reals, swd_baseline_or_None, msssim_real_or_None)``.

    Everything here depends only on the stage and the seed — not on the
    snapshot — so history mode passes a cache dict: a run whose snapshots
    share a stage would otherwise recompute the identical real-vs-real SWD
    (as expensive as the real-vs-fake scoring) once per snapshot."""
    key = (int(depth), round(float(alpha), 6))
    if cache is not None and key in cache:
        return cache[key]
    num = params["num_samples"]
    mb = params["minibatch"]
    dataset.model_depth = depth
    dataset.alpha = alpha
    rng = np.random.RandomState(params["random_seed"])
    want_baseline = bool(params["real_baseline"])
    draw = num * 2 if want_baseline else num
    # Disjoint halves when the dataset is big enough (a shared image would
    # bias the real-vs-real floor toward zero); with replacement otherwise.
    if len(dataset) >= draw:
        idx = rng.permutation(len(dataset))[:draw]
    else:
        idx = rng.randint(0, len(dataset), size=draw)
    print(f"Collecting {draw} real images at depth {depth}...")
    all_reals = np.stack([dataset[i] for i in idx])  # (N,H,W,C) in [-1, 1]
    reals, reals_b = all_reals[:num], all_reals[num:]
    baseline = ms_real = None
    if want_baseline:
        baseline = swd(reals, reals_b, jax.random.PRNGKey(
            params["random_seed"]), **_swd_kwargs(params))
    if params["msssim"] and min(reals.shape[1], reals.shape[2]) >= 11:
        from pggan_tpu.metrics.msssim import pairwise_msssim
        ms_real = pairwise_msssim(
            reals, jax.random.PRNGKey(params["random_seed"] + 1),
            minibatch=mb)
    out = (reals, baseline, ms_real)
    if cache is not None:
        cache[key] = out
    return out


def _score_snapshot(path, dataset, params, stage_cache=None):
    """Score ONE generator snapshot against ``dataset`` (set to the
    snapshot's own depth/alpha); returns ``(payload, results, baseline)``."""
    num = params["num_samples"]
    mb = params["minibatch"]
    G, g_params, meta = load_snapshot(path)
    depth, alpha = meta["depth"], meta["alpha"]
    print(f"Snapshot: depth {depth}, alpha {alpha}, "
          f"latent {G.latent_size}")

    reals, baseline, ms_real = _reals_and_floors(
        dataset, depth, alpha, params, stage_cache)

    print(f"Generating {num} samples...")
    rng = np.random.RandomState(params["random_seed"] + 2)
    fakes = sample_images(G, g_params, depth, alpha, num,
                          minibatch=mb, rng=rng)

    swd_key = jax.random.PRNGKey(params["random_seed"])
    print("Scoring (SWD x1e3, lower is better)...")
    results = swd(reals, fakes, swd_key, **_swd_kwargs(params))
    for k, v in results.items():
        label = f"{k}px" if k != "avg" else "avg"
        floor = f"   (real-vs-real floor {baseline[k]:8.2f})" \
            if baseline else ""
        print(f"  swd[{label:>6}] = {v:8.2f}{floor}")

    ms_fake = None
    if params["msssim"] and min(reals.shape[1], reals.shape[2]) >= 11:
        # paper §5 mode-collapse statistic: mean MS-SSIM among random pairs
        # of one set — high fake-pair similarity vs the reals' own pairing
        # means the generator emits near-duplicates
        from pggan_tpu.metrics.msssim import pairwise_msssim
        k_pair = jax.random.PRNGKey(params["random_seed"] + 1)
        ms_fake = pairwise_msssim(fakes, k_pair, minibatch=mb)
        print(f"  msssim[ fakes] = {ms_fake:8.4f}   "
              f"(real-pair baseline {ms_real:8.4f}; ~baseline = healthy, "
              f"~1.0 = mode collapse)")

    payload = {f"swd_{k}": v for k, v in results.items()}
    if baseline:
        payload.update({f"swd_baseline_{k}": v
                        for k, v in baseline.items()})
    if ms_fake is not None:
        payload.update(msssim_fakes=ms_fake, msssim_reals=ms_real)
    payload.update(generator_path=path, depth=depth, alpha=alpha,
                   num_samples=num,
                   # identity fingerprint for history-mode resume: snapshots
                   # are kimg-named identically across runs, so basename
                   # alone can't tell "same snapshot, different staging dir"
                   # from "different run entirely"
                   snapshot_bytes=os.path.getsize(path))
    return payload, results, baseline


def _run_snapshots(run_dir: str) -> list[str]:
    """Every generator snapshot of a run, kimg-ascending; where a kimg has a
    generator-ema twin, the smoothed snapshot is scored instead."""
    import glob as _glob

    from pggan_tpu.checkpoint import ema_twin, snapshot_kimg

    plain = sorted(
        (p for p in _glob.glob(os.path.join(
            run_dir, "network-snapshot-generator-*.dat"))
         if "-generator-ema-" not in p), key=snapshot_kimg)
    return [ema_twin(p) or p for p in plain]


def evaluate(params):
    enable_persistent_compilation_cache()
    num = params["num_samples"]
    mb = params["minibatch"]
    if mb <= 0:
        raise SystemExit(f"--minibatch must be positive, got {mb}")
    if num % mb:
        # the SWD scorer streams descriptors in fixed minibatch chunks so
        # every chunk reuses ONE compiled program (metrics/swd.py); the
        # sampler could pad a remainder, but the scorer can't — keep the
        # contract visible up front
        raise SystemExit(f"num_samples ({num}) must be a multiple of "
                         f"minibatch ({mb}) — the SWD scorer streams "
                         f"fixed-size chunks")
    if params["min_res"] < params["nhood_size"]:
        # validate the flag combination ONCE up front: inside history mode
        # the per-snapshot skip handler must only ever see the
        # resolution-too-small ValueError, never this configuration error
        # (which would silently skip every snapshot)
        raise SystemExit(
            f"--min_res ({params['min_res']}) must be >= --nhood_size "
            f"({params['nhood_size']}): the coarsest pyramid level must "
            f"fit at least one patch")

    dataset = _build_dataset(params)
    try:
        if params["run_dir"]:
            # history mode: score every snapshot of a run (train with
            # --SaverPlugin.keep_old_checkpoints True to keep them all) and
            # append one JSON line per snapshot — the metric-vs-kimg curve
            snaps = _run_snapshots(params["run_dir"])
            if not snaps:
                raise SystemExit(f"--run_dir {params['run_dir']}: no "
                                 f"generator snapshots found")
            out = params["output_json"] or os.path.join(
                params["run_dir"], "eval_history.jsonl")
            # Resume: a prior (possibly interrupted) pass left one JSON row
            # per scored snapshot — keep those rows and skip their snapshots,
            # so a curve over N slow TPU evals survives a dropped tunnel.
            # Keyed by basename (the same snapshot scored from a different
            # staging dir still counts), guarded by the snapshot's byte size
            # and the row's num_samples: kimg-numbered basenames repeat
            # across runs, and a reused --output_json from ANOTHER run must
            # re-score rather than silently return the stale curve.
            rows = []
            done = {}
            if os.path.exists(out):
                with open(out) as f:
                    rows = [json.loads(line) for line in f if line.strip()]
                done = {os.path.basename(r["generator_path"]):
                        r.get("snapshot_bytes")
                        for r in rows if r.get("num_samples") == num}
                if done:
                    print(f"Resuming: {len(done)} snapshots already scored "
                          f"in {out}")
            stage_cache = {}
            _MISS = object()
            for p in snaps:
                base = os.path.basename(p)
                prior = done.get(base, _MISS)
                if prior is not _MISS:
                    if prior is None or prior == os.path.getsize(p):
                        continue  # legacy row (no fingerprint) or same file
                    print(f"  re-scoring {base}: resumed row's snapshot size "
                          f"differs (row from a different run?)")
                print(f"\n=== {os.path.basename(p)} ===")
                try:
                    payload, _, _ = _score_snapshot(p, dataset, params,
                                                    stage_cache)
                except ValueError as e:
                    if "min_res" not in str(e):
                        raise
                    # A progressive run's earliest snapshots (4-8 px) sit
                    # below the SWD protocol's coarsest pyramid level; skip
                    # them rather than abort the whole curve.
                    print(f"  skipped (below SWD min_res): {e}")
                    continue
                # a fresh score supersedes any stale same-name row (size
                # mismatch above, or a row scored at another num_samples)
                rows = [r for r in rows
                        if os.path.basename(r["generator_path"]) != base]
                rows.append(payload)
                with open(out + ".tmp", "w") as f:
                    for r in rows:
                        f.write(json.dumps(r) + "\n")
                os.replace(out + ".tmp", out)
            print(f"\nWrote {len(rows)} rows to {out}")
            return rows

        from pggan_tpu.checkpoint import resolve_generator_path
        params["generator_path"] = resolve_generator_path(
            params["generator_path"], params["result_dir"])
        print(f"Loading {params['generator_path']}")
        payload, results, baseline = _score_snapshot(
            params["generator_path"], dataset, params)
        out = params["output_json"]
        if out:
            tmp = out + ".tmp"
            with open(tmp, "w") as f:
                json.dump(payload, f, indent=2)
            os.replace(tmp, out)
            print(f"Wrote {out}")
        return results, baseline
    finally:
        dataset.close()


def cli_main(argv=None):
    parser = ArgumentParser(description=__doc__)
    flat_defaults = dict(default_params)
    for k in default_params:
        parser.add_argument(
            f"--{k}",
            type=partial(generic_arg_parse, hinttype=type(default_params[k])))
    add_class_args(parser, get_all_classes(dataset_module),
                   default_params=flat_defaults)
    parser.set_defaults(**flat_defaults)
    params = get_structured_params(vars(parser.parse_args(argv)))
    return evaluate(params)


if __name__ == "__main__":
    cli_main()
