"""Training entry point with the reflective ``--ClassName.param`` CLI
(reference train.py).

Composes dataset -> models -> fused step builder -> trainer -> plugin stack
and runs the progressive schedule. Usage mirrors the reference:

    python -m pggan_tpu.cli.train --dataset_class DefaultImageFolderDataset \
        --DefaultImageFolderDataset.dir_path datasets/images \
        --postprocessors "['ImageSaver']" --total_kimg 3000

TPU specifics: with multiple visible devices a 1-D data-parallel mesh is
built automatically (``--data_parallel False`` to disable); multi-host runs
initialize ``jax.distributed`` from the environment and shard both the batch
and the input file space per host.
"""

from __future__ import annotations

import os
import re
from argparse import ArgumentParser
from collections import OrderedDict
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

import pggan_tpu.data.datasets as dataset_module
import pggan_tpu.postprocess as postprocess_module
from pggan_tpu.checkpoint import (
    load_snapshot,
    load_training_state,
    snapshot_kimg,
)
from pggan_tpu.data.loader import DataIterator
from pggan_tpu.models import Discriminator, Generator
from pggan_tpu.parallel.mesh import (
    check_batch_divisible,
    data_parallel_mesh,
    fit_minibatch_to_mesh,
    initialize_distributed,
)
from pggan_tpu.training.plugins import (
    AbsoluteTimeMonitor,
    DepthManager,
    EfficientLossMonitor,
    LRScheduler,
    MetricsExporter,
    OutputGenerator,
    SaverPlugin,
    TeeLogger,
)
from pggan_tpu.training.state import TrainState, init_state, make_optimizer
from pggan_tpu.training.steps import TrainStepBuilder
from pggan_tpu.training.trainer import Trainer
from pggan_tpu.utils.config import (
    add_class_args,
    generic_arg_parse,
    get_all_classes,
    get_structured_params,
)
from pggan_tpu.utils.misc import (
    create_result_subdir,
    enable_persistent_compilation_cache,
    load_pkl,
    params_to_str,
    random_latents,
    save_pkl,
)


class Adam:
    """Flag-surface stand-in for the optimizer config (the reference exposes
    ``--Adam.betas`` via torch's Adam signature, train.py:191-195; here the
    optimizer is optax, configured through this group)."""

    def __init__(self, betas=(0.0, 0.99), eps=1e-8):
        self.betas = betas
        self.eps = eps


# Top-level hyperparams (reference train.py:23-48) + TPU additions.
default_params = OrderedDict(
    result_dir="results",
    exp_name="specs512",
    minibatch_size=16,
    lr_rampup_kimg=40,
    G_lr_max=0.001,
    D_lr_max=0.001,
    total_kimg=3000,
    tick_kimg_default=20,
    image_snapshot_ticks=3,
    resume_network="",
    resume_time=0,
    num_data_workers=16,
    random_seed=1337,
    progressive_growing=True,
    comet_key="",
    comet_project_name="None",
    iwass_lambda=10.0,
    iwass_epsilon=0.001,
    iwass_target=1.0,
    g_ema_beta=0.0,      # >0 keeps an EMA of G (e.g. 0.999) and snapshots it
                         # as network-snapshot-generator-ema-*.dat (Karras'
                         # Gs smoothing; the reference has none)
    save_dataset="",
    load_dataset="",
    dataset_class="",
    postprocessors=[],
    checkpoints_dir="",
    # --- TPU-native additions ---
    data_parallel=True,   # shard the batch over all visible devices
    num_devices=0,        # 0 = all visible devices
    metrics_jsonl=True,   # per-tick metrics.jsonl in the result dir
    debug_nans=False,     # jax nan-checker sanitizer mode (SURVEY.md §5)
    profile_dir="",       # capture a jax.profiler trace of a few steps
    device_input_prep=False,  # ship uint8 batches; fade+remap on device
    scale_lr_with_batch=False,  # linear LR scaling when the pod batch policy
                                # rounds a stage's global batch up to the mesh
)

LOSSES = ["G_loss", "D_loss", "D_real", "D_fake"]


def load_models(resume_network, result_dir, logger):
    """Rebuild G/D from snapshot files; ``resume_network`` is a path pattern
    relative to the results root with ``{}`` for the model name (reference
    train.py:60-64)."""
    logger.log(f"Resuming {resume_network}")
    g_path = os.path.join(result_dir, resume_network.format("generator"))
    d_path = os.path.join(result_dir, resume_network.format("discriminator"))
    G, g_params, g_meta = load_snapshot(g_path)
    D, d_params, d_meta = load_snapshot(d_path)
    return G, D, g_params, d_params, g_meta, d_path


def _resume_kimg(resume_network: str) -> int:
    m = re.search(r"(\d+)\.dat$", resume_network.format("generator"))
    return int(m.group(1)) if m else 0


def find_latest_snapshot(result_root: str) -> str:
    """Newest ``network-snapshot-generator-*.dat`` under the results root,
    returned as a ``resume_network`` pattern relative to the root —
    ``--resume_network latest`` (SURVEY §5 "auto-resume-latest"; the
    reference requires hand-typing the pattern, train.py:60-64).

    Selection rule: the run DIRECTORY with the newest snapshot mtime wins
    (continue the most recent experiment, even if an older one trained to a
    higher kimg), then the highest kimg INSIDE it (kimg is monotone within a
    run, so a copied/rsynced tree with scrambled mtimes still resumes the
    true latest snapshot, not whichever file happened to be copied last)."""
    import glob
    cands = []
    for p in glob.glob(os.path.join(result_root, "**",
                                    "network-snapshot-generator-*.dat"),
                       recursive=True):
        if os.path.exists(p.replace("-generator-", "-discriminator-")):
            cands.append(p)
    if not cands:
        raise SystemExit(
            f"--resume_network latest: no snapshot pairs under {result_root}")

    by_dir = {}
    for p in cands:
        by_dir.setdefault(os.path.dirname(p), []).append(p)
    run_dir = max(by_dir, key=lambda d: max(map(os.path.getmtime, by_dir[d])))
    rel = os.path.relpath(max(by_dir[run_dir], key=snapshot_kimg),
                          result_root)
    d, b = os.path.split(rel)
    return os.path.join(d, b.replace("network-snapshot-generator-",
                                     "network-snapshot-{}-"))


def _alias_default(cfg: dict, key: str, cls, value) -> None:
    """Wire a live top-level alias flag: ``value`` feeds ``cfg[key]`` unless
    the class-scoped ``--Cls.key`` flag was explicitly moved off its
    constructor default (the class-scoped flag wins; every auto-generated
    flag always lands in the structured params with its signature default, so
    presence alone can't distinguish 'given' from 'defaulted')."""
    import inspect
    default = inspect.signature(cls.__init__).parameters[key].default
    if cfg.get(key, default) == default:
        cfg[key] = value


def make_experiment(params):
    """Optional CometML wiring (reference train.py:67-87); returns None when
    no key is configured or comet_ml is unavailable."""
    if not params["comet_key"]:
        return None
    try:
        from comet_ml import Experiment
    except ImportError as e:
        print(f"Unable to load comet_ml: {e}")
        return None
    experiment = Experiment(api_key=params["comet_key"],
                            project_name=params["comet_project_name"],
                            log_code=False)
    experiment.log_parameters({k: str(v) for k, v in params.items()
                               if not isinstance(v, dict)})
    return experiment


def main(params):
    initialize_distributed()
    enable_persistent_compilation_cache()
    if params.get("debug_nans"):
        jax.config.update("jax_debug_nans", True)
    np.random.seed(params["random_seed"])
    master_key = jax.random.PRNGKey(params["random_seed"])

    # -- dataset (reference train.py:91-98) ---------------------------------
    if params["load_dataset"]:
        dataset = load_pkl(params["load_dataset"])
    elif params["dataset_class"]:
        cls = getattr(dataset_module, params["dataset_class"], None)
        if cls is None:
            from pggan_tpu.utils.config import get_all_classes
            names = sorted(c.__name__ for c in get_all_classes(dataset_module))
            raise SystemExit(
                f"Unknown dataset_class {params['dataset_class']!r}; "
                f"available: {', '.join(names)}")
        dataset = cls(**params.get(params["dataset_class"], {}))
        if params["save_dataset"]:
            save_pkl(params["save_dataset"], dataset)
    else:
        raise Exception("One of either load_dataset (path to pkl) or "
                        "dataset_class needs to be specified.")

    result_dir = create_result_subdir(params["result_dir"], params["exp_name"])

    stats_to_log = ["tick_stat", "kimg_stat"]
    if params["progressive_growing"]:
        stats_to_log.extend(["depth", "alpha", "lod", "minibatch_size"])
    stats_to_log.extend(["time", "sec.tick", "sec.kimg"] + LOSSES)
    logger = TeeLogger(os.path.join(result_dir, "log.txt"), stats_to_log,
                       [(1, "epoch")])
    logger.log(params_to_str(params))

    # -- models (reference train.py:120-138) --------------------------------
    resume_state = None
    resume_nimg = params.get("Trainer", {}).get("resume_nimg", 0)
    if params["resume_network"] == "latest":
        params["resume_network"] = find_latest_snapshot(params["result_dir"])
        logger.log(f"resume latest -> {params['resume_network']}")
    if params["resume_network"]:
        G, D, g_params, d_params, g_meta, d_path = load_models(
            params["resume_network"], params["result_dir"], logger)
        if not resume_nimg:
            resume_nimg = _resume_kimg(params["resume_network"]) * 1000
        state_path = os.path.join(
            os.path.dirname(d_path),
            SaverPlugin.state_pattern.format(
                "{:06}".format(resume_nimg // 1000)))
        if os.path.exists(state_path):
            resume_state, resume_nimg, resume_iterations, resume_base_time = \
                load_training_state(state_path)
            logger.log(f"Restored full training state from {state_path}")
        else:
            resume_iterations = 0
            resume_base_time = 0.0
    else:
        G = Generator(dataset.shape, **params.get("Generator", {}))
        D = Discriminator(dataset.shape, **params.get("Discriminator", {}))
        g_params = d_params = None
        resume_iterations = 0
        resume_base_time = 0.0
    if params["progressive_growing"]:
        assert G.max_depth == D.max_depth
    latent_size = G.latent_size

    logger.log(str(G))
    logger.log(str(D))

    # -- parallelism --------------------------------------------------------
    mesh = None
    n_dev = params["num_devices"] or jax.device_count()
    if params["data_parallel"] and n_dev > 1:
        mesh = data_parallel_mesh(n_dev)
        logger.log(f"Data-parallel mesh over {n_dev} devices "
                   f"({jax.process_count()} host(s))")

    # -- optimizer + state --------------------------------------------------
    adam_cfg = params.get("Adam", {})
    optimizer = make_optimizer(b1=adam_cfg.get("betas", (0.0, 0.99))[0],
                               b2=adam_cfg.get("betas", (0.0, 0.99))[1],
                               eps=adam_cfg.get("eps", 1e-8))
    if resume_state is not None:
        state = TrainState(*resume_state) if not isinstance(
            resume_state, TrainState) else resume_state
    else:
        kg, kd, krest = jax.random.split(master_key, 3)
        if g_params is None:
            g_params = G.init(kg)
            d_params = D.init(kd)
        state = init_state(g_params, d_params, optimizer, krest)

    logger.log("Total number of parameters in Generator: {}".format(
        G.num_params(state.g_params)))
    logger.log("Total number of parameters in Discriminator: {}".format(
        D.num_params(state.d_params)))

    trainer_cfg = dict(params.get("Trainer", {}))
    trainer_cfg.pop("resume_nimg", None)
    trainer_cfg.pop("resume_iterations", None)
    d_repeats = trainer_cfg.pop("D_training_repeats", 1)

    g_ema_beta = float(params["g_ema_beta"])
    if g_ema_beta > 0 and getattr(state, "g_ema", None) is None:
        # fresh start, or resume from a pre-EMA checkpoint: seed the average
        # at the current params (Karras' Gs initialization). COPIES, not
        # aliases — the step donates the whole state, and two leaves sharing
        # one device buffer would be a double donation.
        state = state._replace(g_ema=jax.tree_util.tree_map(
            lambda x: jnp.array(x), state.g_params))
    elif g_ema_beta <= 0 and getattr(state, "g_ema", None) is not None:
        # resume of an EMA run WITHOUT --g_ema_beta: the step would carry
        # the restored average frozen forever, and OutputGenerator /
        # SaverPlugin / '--generator_path latest' would keep preferring the
        # ever-staler EMA twin over the live generator. Drop it instead.
        logger.log("Resumed state has a generator EMA but --g_ema_beta is "
                   "0; dropping the stale average (pass --g_ema_beta to "
                   "keep smoothing it)")
        state = state._replace(g_ema=None)
    builder = TrainStepBuilder(
        G, D, optimizer, d_training_repeats=d_repeats,
        iwass_lambda=params["iwass_lambda"],
        iwass_epsilon=params["iwass_epsilon"],
        iwass_target=params["iwass_target"],
        mesh=mesh,
        g_ema_beta=g_ema_beta if g_ema_beta > 0 else None)

    # -- input pipeline (reference train.py:140-145) ------------------------
    def get_dataiter(minibatch_size):
        # minibatch_size is the GLOBAL batch; each host loads its shard
        if mesh is not None:
            check_batch_divisible(minibatch_size, mesh)
        nproc = jax.process_count()
        if minibatch_size % nproc:
            raise ValueError(f"global minibatch {minibatch_size} must divide "
                             f"across {nproc} hosts")
        return DataIterator(dataset, minibatch_size // nproc,
                            num_workers=params["num_data_workers"],
                            seed=params["random_seed"] + jax.process_index(),
                            shard_index=jax.process_index(),
                            num_shards=jax.process_count(),
                            raw=params.get("device_input_prep", False))

    def rl(bs):
        return lambda: random_latents(bs, latent_size)

    mb_def = params["minibatch_size"]
    trainer = Trainer(G, D, builder, state, dataset,
                      None if params["progressive_growing"]
                      else iter(get_dataiter(mb_def)),
                      rl(mb_def),
                      D_training_repeats=d_repeats,
                      resume_nimg=resume_nimg,
                      resume_iterations=resume_iterations,
                      **trainer_cfg)

    # -- plugin stack, reference order (train.py:167-184) -------------------
    if params["progressive_growing"]:
        max_depth = min(G.max_depth, D.max_depth)
        dm_cfg = dict(params.get("DepthManager", {}))
        # top-level --tick_kimg_default is the default for the class-scoped
        # flag (which wins when given). The reference carried this param but
        # never read it (train.py:31 — dead config, like its random_seed);
        # here it is live, same treatment the seed got (SURVEY §2.7).
        _alias_default(dm_cfg, "tick_kimg_default", DepthManager,
                       params["tick_kimg_default"])
        if dm_cfg.get("max_lod") is None:  # Karras-parity lod logging on by default
            dm_cfg["max_lod"] = G.R
        if dm_cfg.get("depth_offset") is None:
            dm_cfg["depth_offset"] = dataset.model_dataset_depth_offset
        if mesh is not None:
            # pod batch policy: the reference per-depth batches (e.g. the
            # 1024px overrides {6:14, 7:6, 8:3}) need not divide the mesh;
            # round each global batch up to a mesh multiple
            from pggan_tpu.training import schedule
            ref_def = dm_cfg.get("minibatch_default",
                                 schedule.MINIBATCH_DEFAULT)
            ref_over = dm_cfg.get("minibatch_overrides",
                                  schedule.MINIBATCH_OVERRIDES)
            new_def, new_over, changed = fit_minibatch_to_mesh(
                ref_def, ref_over, mesh)
            dm_cfg["minibatch_default"] = new_def
            dm_cfg["minibatch_overrides"] = new_over
            if changed:
                logger.log(
                    f"Pod batch policy: global minibatches rounded up to "
                    f"multiples of {mesh.shape['data']} devices: "
                    + ", ".join(
                        ("default" if d == -1 else f"depth {d}")
                        + f" {old}->{new}"
                        for d, (old, new) in sorted(changed.items())))
                if params["scale_lr_with_batch"]:
                    dm_cfg["lr_reference_minibatch"] = {
                        "default": ref_def, "overrides": dict(ref_over or {})}
                    logger.log("LR linearly scaled with the grown batches "
                               "(--scale_lr_with_batch)")
        trainer.register_plugin(DepthManager(get_dataiter, rl, max_depth,
                                             **dm_cfg))
    else:
        trainer.depth = dataset.model_depth
        trainer.alpha = dataset.alpha
        trainer.minibatch_size = mb_def
        # fixed (depth, alpha) forever -> grouped dispatch always legal
        trainer.schedule_horizon = lambda nimg: float("inf")
    for i, loss_name in enumerate(LOSSES):
        trainer.register_plugin(EfficientLossMonitor(i, loss_name))

    # wall-clock BEFORE the saver: the checkpoint persists the cumulative
    # "time" stat, which must be fresh for the tick being saved. On resume
    # the persisted value continues the clock; --resume_time overrides it.
    trainer.register_plugin(AbsoluteTimeMonitor(
        params["resume_time"] or resume_base_time))
    checkpoints_dir = params["checkpoints_dir"] or result_dir
    trainer.register_plugin(SaverPlugin(checkpoints_dir,
                                        **params.get("SaverPlugin", {})))

    def substitute_samples_path(d):
        return {k: (os.path.join(result_dir, v) if k == "samples_path" else v)
                for k, v in d.items()}

    postprocessors = []
    for x in params["postprocessors"]:
        proc_cls = getattr(postprocess_module, x, None)
        if proc_cls is None:
            from pggan_tpu.utils.config import get_all_classes
            names = sorted(c.__name__
                           for c in get_all_classes(postprocess_module))
            raise SystemExit(f"Unknown postprocessor {x!r}; "
                             f"available: {', '.join(names)}")
        postprocessors.append(
            proc_cls(**substitute_samples_path(params.get(x, {}))))
    # top-level --image_snapshot_ticks defaults the class-scoped
    # --OutputGenerator.output_snapshot_ticks (reference train.py:32 carried
    # it dead; live here — see tick_kimg_default above).
    og_cfg = dict(params.get("OutputGenerator", {}))
    _alias_default(og_cfg, "output_snapshot_ticks", OutputGenerator,
                   params["image_snapshot_ticks"])
    trainer.register_plugin(OutputGenerator(
        lambda n: random_latents(n, latent_size), postprocessors, **og_cfg))
    if params.get("profile_dir"):
        from pggan_tpu.training.plugins import TraceProfiler
        trainer.register_plugin(TraceProfiler(params["profile_dir"]))
    trainer.register_plugin(LRScheduler(params["D_lr_max"],
                                        params["G_lr_max"],
                                        params["lr_rampup_kimg"]))
    trainer.register_plugin(logger)
    metric_fields = [f"{l}.epoch_mean" for l in LOSSES] + \
        ["sec.kimg", "sec.tick", "kimg_stat"] + \
        (["depth", "alpha"] if params["progressive_growing"] else [])
    experiment = make_experiment(params)
    if params["metrics_jsonl"] or experiment is not None:
        trainer.register_plugin(MetricsExporter(
            metric_fields,
            jsonl_path=(os.path.join(result_dir, "metrics.jsonl")
                        if params["metrics_jsonl"] else None),
            experiment=experiment))

    trainer.run(params["total_kimg"])
    if hasattr(trainer.dataiter, "close") and trainer.dataiter is not None:
        trainer.dataiter.close()
    dataset.close()


def build_parser() -> ArgumentParser:
    parser = ArgumentParser(description=__doc__)
    needarg_classes = [Trainer, Generator, Discriminator, DepthManager,
                       SaverPlugin, OutputGenerator, Adam]
    needarg_classes += get_all_classes(dataset_module)
    needarg_classes += get_all_classes(postprocess_module)
    excludes = {
        "Generator": {"dtype"},
        "Discriminator": {"dtype"},
        "DepthManager": {"create_dataiter_fun", "create_rlg", "max_depth"},
    }
    flat_defaults = dict(default_params)
    for k in default_params:
        parser.add_argument(
            f"--{k}",
            type=partial(generic_arg_parse, hinttype=type(default_params[k])))
    add_class_args(parser, needarg_classes, excludes=excludes,
                   default_params=flat_defaults)
    parser.set_defaults(**flat_defaults)
    return parser


def cli_main(argv=None):
    parser = build_parser()
    params = get_structured_params(vars(parser.parse_args(argv)))
    main(params)


if __name__ == "__main__":
    cli_main()
