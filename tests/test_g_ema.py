"""Generator EMA (--g_ema_beta): per-step math, grouped-dispatch exactness,
old-checkpoint compatibility, and the saver's extra snapshot.

The reference has no EMA; Karras' official implementation smooths G for
sampling. Here the EMA updates INSIDE the fused step (so the grouped scan
applies it exactly per step) and rides in TrainState as a trailing-default
field, keeping pre-EMA training-state pickles loadable."""

import glob
import os

import numpy as np

import jax
import jax.numpy as jnp

from pggan_tpu.models import Discriminator, Generator
from pggan_tpu.training.state import TrainState, init_state, make_optimizer
from pggan_tpu.training.steps import TrainStepBuilder

SHAPE = (16, 1, 16, 16)
BETA = 0.9
DEPTH, B = 1, 4


def _fresh(with_ema=True):
    G = Generator(SHAPE, latent_size=8, fmap_base=32, fmap_max=16)
    D = Discriminator(SHAPE, fmap_base=32, fmap_max=16)
    opt = make_optimizer()
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    state = init_state(G.init(ks[0]), D.init(ks[1]), opt, ks[2])
    if with_ema:
        state = state._replace(g_ema=jax.tree_util.tree_map(
            jnp.array, state.g_params))
    return G, D, opt, state


def _reals(n_steps=1, seed=0):
    res = 4 * 2 ** DEPTH
    return np.random.RandomState(seed).randn(
        *(((n_steps,) if n_steps > 1 else ()) + (1, B, res, res, 1))
    ).astype(np.float32)


def _get(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def test_ema_matches_recursive_definition():
    G, D, opt, state = _fresh()
    builder = TrainStepBuilder(G, D, opt, g_ema_beta=BETA)
    step = builder.step_fn(DEPTH, B, fade=False)
    expected = _get(state.g_ema)
    lr = np.float32(1e-2)
    for k in range(4):
        state, _ = step(state, _reals(seed=k), np.float32(1.0), lr, lr)
        params_k = _get(state.g_params)
        expected = jax.tree_util.tree_map(
            lambda e, p: e + (1.0 - BETA) * (p - e), expected, params_k)
        got = _get(state.g_ema)
        for a, b in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(expected)):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
        # the EMA must trail the live params, not equal them
        diff = max(float(np.abs(a - b).max()) for a, b in zip(
            jax.tree_util.tree_leaves(got),
            jax.tree_util.tree_leaves(params_k)))
        assert diff > 0


def test_grouped_dispatch_ema_equals_per_step():
    lr = np.float32(1e-2)
    reals4 = _reals(n_steps=4, seed=1)

    G, D, opt, s1 = _fresh()
    step = TrainStepBuilder(G, D, opt, g_ema_beta=BETA).step_fn(
        DEPTH, B, fade=False)
    for k in range(4):
        s1, _ = step(s1, reals4[k], np.float32(1.0), lr, lr)

    G2, D2, opt2, s2 = _fresh()
    gstep = TrainStepBuilder(G2, D2, opt2, g_ema_beta=BETA).group_step_fn(
        DEPTH, B, fade=False, group=4)
    ones = np.ones((4,), np.float32)
    s2, _ = gstep(s2, reals4, ones, ones * lr, ones * lr)

    for a, b in zip(jax.tree_util.tree_leaves(_get(s1.g_ema)),
                    jax.tree_util.tree_leaves(_get(s2.g_ema))):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


def test_beta_unset_keeps_none_and_old_pickles_load(tmp_path):
    G, D, opt, state = _fresh(with_ema=False)
    builder = TrainStepBuilder(G, D, opt)  # no EMA
    step = builder.step_fn(DEPTH, B, fade=False)
    state, _ = step(state, _reals(), np.float32(1.0),
                    np.float32(1e-2), np.float32(1e-2))
    assert state.g_ema is None

    # a pre-round-4 pickle reduces to TrainState(*five_values)
    old = TrainState(state.g_params, state.d_params, state.g_opt,
                     state.d_opt, state.rng)
    assert old.g_ema is None

    from pggan_tpu.checkpoint import load_training_state, save_training_state
    p = str(tmp_path / "training-state-000001.dat")
    save_training_state(p, state, 1000, 10)
    loaded, nimg, iters, _ = load_training_state(p)
    assert loaded.g_ema is None and nimg == 1000


def test_missing_ema_init_raises():
    G, D, opt, state = _fresh(with_ema=False)
    builder = TrainStepBuilder(G, D, opt, g_ema_beta=BETA)
    step = builder.step_fn(DEPTH, B, fade=False)
    try:
        step(state, _reals(), np.float32(1.0), np.float32(1e-2),
             np.float32(1e-2))
    except ValueError as e:
        assert "g_ema" in str(e)
    else:
        raise AssertionError("expected a clear ValueError")


def test_cli_ema_snapshot_roundtrip(tmp_path):
    """Full CLI with --g_ema_beta: the extra generator-ema snapshot appears,
    loads, and samples."""
    from PIL import Image

    from pggan_tpu.checkpoint import load_snapshot
    from pggan_tpu.cli.train import cli_main

    data_dir = str(tmp_path / "imgs")
    os.makedirs(data_dir)
    rng = np.random.RandomState(0)
    for i in range(8):
        Image.fromarray(rng.randint(0, 256, (16, 16), dtype=np.uint8),
                        "L").save(os.path.join(data_dir, f"i{i}.png"))
    results = str(tmp_path / "results")
    cli_main([
        "--result_dir", results, "--exp_name", "ema",
        "--dataset_class", "DefaultImageFolderDataset",
        "--DefaultImageFolderDataset.dir_path", data_dir,
        "--DefaultImageFolderDataset.preload", "True",
        "--DefaultImageFolderDataset.model_initial_depth", "1",
        "--progressive_growing", "False",
        "--num_data_workers", "2",
        "--total_kimg", "0.1", "--minibatch_size", "8",
        "--Trainer.tick_nimg_default", "48",
        "--g_ema_beta", "0.95",
        "--Generator.latent_size", "8", "--Generator.fmap_base", "32",
        "--Generator.fmap_max", "16", "--Discriminator.fmap_base", "32",
        "--Discriminator.fmap_max", "16",
        "--data_parallel", "False",
    ])
    run_dir = glob.glob(os.path.join(results, "*-ema"))[0]
    ema_snaps = glob.glob(os.path.join(
        run_dir, "network-snapshot-generator-ema-*.dat"))
    assert ema_snaps, os.listdir(run_dir)
    Gm, params, meta = load_snapshot(ema_snaps[-1])
    out = Gm.apply(params, jnp.zeros((2, 8), jnp.float32), meta["depth"],
                   np.float32(meta["alpha"]))
    assert np.isfinite(np.asarray(out)).all()
    # the smoothed params differ from the live ones
    live = glob.glob(os.path.join(
        run_dir, "network-snapshot-generator-0*.dat"))
    live = [p for p in live if "-ema-" not in p]
    _, live_params, _ = load_snapshot(live[-1])
    leaves = zip(jax.tree_util.tree_leaves(params),
                 jax.tree_util.tree_leaves(live_params))
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0
               for a, b in leaves)


def test_output_generator_samples_from_ema():
    """OutputGenerator draws from the smoothed G when one exists (Karras
    samples from Gs), the live G otherwise or when use_ema=False."""
    from types import SimpleNamespace

    from pggan_tpu.training.plugins import OutputGenerator

    captured = {}

    def fake_apply(p, z, a):
        captured["params"] = p
        return np.zeros((len(z), 4, 4, 1), np.float32)

    def make_trainer(g_ema):
        state = TrainState("live", "d", None, None, None, g_ema)
        return SimpleNamespace(builder=SimpleNamespace(
            sample_fn=lambda d: fake_apply),
            state=state, depth=0, alpha=1.0, cur_nimg=1000)

    def run(trainer, **kw):
        og = OutputGenerator(lambda n: np.zeros((n, 8), np.float32), [], **kw)
        og.register(trainer)
        og.epoch(1)
        return captured.pop("params")

    assert run(make_trainer("smoothed")) == "smoothed"
    assert run(make_trainer("smoothed"), use_ema=False) == "live"
    assert run(make_trainer(None)) == "live"


def test_ema_under_data_parallel_mesh():
    """EMA leaf rides the replicated state sharding through the grouped
    sharded step (GSPMD; 8 virtual devices)."""
    from pggan_tpu.parallel.mesh import data_parallel_mesh

    G, D, opt, state = _fresh()
    builder = TrainStepBuilder(G, D, opt, g_ema_beta=BETA,
                               mesh=data_parallel_mesh(8))
    gstep = builder.group_step_fn(DEPTH, 8, fade=False, group=2)
    res = 4 * 2 ** DEPTH
    reals = np.random.RandomState(2).randn(2, 1, 8, res, res, 1).astype(
        np.float32)
    ones = np.ones((2,), np.float32)
    before = _get(state.g_ema)
    state, metrics = gstep(state, reals, ones, ones * 1e-2, ones * 1e-2)
    assert np.isfinite(np.asarray(metrics["G_loss"])).all()
    after = _get(state.g_ema)
    moved = max(float(np.abs(a - b).max()) for a, b in zip(
        jax.tree_util.tree_leaves(after), jax.tree_util.tree_leaves(before)))
    assert moved > 0


def test_resume_without_beta_drops_stale_ema(tmp_path):
    """Resuming an EMA run WITHOUT --g_ema_beta must drop the restored
    average: otherwise the step carries it frozen and OutputGenerator /
    SaverPlugin / '--generator_path latest' keep preferring an ever-staler
    EMA twin over the live generator (round-4 review finding)."""
    from PIL import Image

    from pggan_tpu.cli.train import cli_main

    data_dir = str(tmp_path / "imgs")
    os.makedirs(data_dir)
    rng = np.random.RandomState(0)
    for i in range(8):
        Image.fromarray(rng.randint(0, 256, (16, 16), dtype=np.uint8),
                        "L").save(os.path.join(data_dir, f"i{i}.png"))
    results = str(tmp_path / "results")
    common = [
        "--result_dir", results, "--exp_name", "r",
        "--dataset_class", "DefaultImageFolderDataset",
        "--DefaultImageFolderDataset.dir_path", data_dir,
        "--DefaultImageFolderDataset.preload", "True",
        "--DefaultImageFolderDataset.model_initial_depth", "1",
        "--progressive_growing", "False",
        "--num_data_workers", "2",
        "--minibatch_size", "8",
        "--Trainer.tick_nimg_default", "48",
        "--Generator.latent_size", "8", "--Generator.fmap_base", "32",
        "--Generator.fmap_max", "16", "--Discriminator.fmap_base", "32",
        "--Discriminator.fmap_max", "16",
        "--data_parallel", "False",
    ]
    cli_main(common + ["--total_kimg", "0.1", "--g_ema_beta", "0.95"])
    run1 = glob.glob(os.path.join(results, "*-r"))[0]
    assert glob.glob(os.path.join(
        run1, "network-snapshot-generator-ema-*.dat"))

    # resume with the default beta 0 -> the stale average must be dropped
    cli_main(common + ["--total_kimg", "0.2", "--resume_network", "latest"])
    run2 = sorted(glob.glob(os.path.join(results, "*-r")))[-1]
    assert run2 != run1
    log = open(os.path.join(run2, "log.txt")).read()
    assert "dropping the stale average" in log
    assert not glob.glob(os.path.join(
        run2, "network-snapshot-generator-ema-*.dat"))
    # the live generator still snapshots and trains
    assert glob.glob(os.path.join(run2, "network-snapshot-generator-*.dat"))
