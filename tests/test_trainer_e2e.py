"""End-to-end integration: a few ticks of progressive training on synthetic
16x16 data, with the full plugin stack, checkpointing and resume
(SURVEY.md §4 integration tests)."""

import glob
import os

import jax
import numpy as np
import pytest

from pggan_tpu.checkpoint import (
    load_snapshot,
    load_training_state,
)
from pggan_tpu.data import DataIterator, SyntheticDataset
from pggan_tpu.models import Discriminator, Generator
from pggan_tpu.postprocess import ImageSaver
from pggan_tpu.training import TrainStepBuilder, Trainer, make_optimizer
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
from pggan_tpu.training.state import init_state
from pggan_tpu.utils.misc import random_latents

RES = 16
LOD_NIMG = 192  # tiny stages: 192 stable + 192 fade
TICK_NIMG = 128


def build_trainer(tmp_path, dataset, resume_nimg=0, resume_state=None,
                  total_seed=0):
    g = Generator(dataset.shape, latent_size=16, fmap_base=64, fmap_max=32)
    d = Discriminator(dataset.shape, fmap_base=64, fmap_max=32)
    opt = make_optimizer()
    if resume_state is None:
        keys = jax.random.split(jax.random.PRNGKey(total_seed), 3)
        state = init_state(g.init(keys[0]), d.init(keys[1]), opt, keys[2])
        iterations = 0
    else:
        state, iterations = resume_state
    builder = TrainStepBuilder(g, d, opt)

    def make_iter(bs):
        return DataIterator(dataset, bs, num_workers=2, seed=1)

    def make_rlg(bs):
        return lambda: random_latents(bs, g.latent_size)

    trainer = Trainer(g, d, builder, state, dataset, None,
                      make_rlg(4), tick_nimg_default=TICK_NIMG,
                      resume_nimg=resume_nimg, resume_iterations=iterations)
    dm = DepthManager(make_iter, make_rlg, g.max_depth,
                      minibatch_default=8, minibatch_overrides={},
                      tick_kimg_default=TICK_NIMG / 1000,
                      tick_kimg_overrides={},
                      lod_training_nimg=LOD_NIMG,
                      lod_transition_nimg=LOD_NIMG,
                      max_lod=4, depth_offset=2)
    trainer.register_plugin(dm)
    for i, name in enumerate(["G_loss", "D_loss", "D_real", "D_fake"]):
        trainer.register_plugin(EfficientLossMonitor(i, name))
    trainer.register_plugin(SaverPlugin(str(tmp_path), network_snapshot_ticks=2))
    samples_dir = str(tmp_path / "samples")
    trainer.register_plugin(OutputGenerator(
        lambda n: random_latents(n, g.latent_size),
        [ImageSaver(samples_dir, resolution=32)],
        samples_count=4, output_snapshot_ticks=2))
    trainer.register_plugin(AbsoluteTimeMonitor())
    trainer.register_plugin(LRScheduler(1e-3, 1e-3, rampup_kimg=0.2))
    trainer.register_plugin(MetricsExporter(
        ["G_loss.epoch_mean", "D_loss.epoch_mean", "sec.kimg", "depth"],
        jsonl_path=str(tmp_path / "metrics.jsonl")))
    log_fields = ["tick_stat", "kimg_stat", "depth", "alpha", "lod",
                  "minibatch_size", "time", "sec.tick", "sec.kimg",
                  "G_loss", "D_loss", "D_real", "D_fake"]
    trainer.register_plugin(TeeLogger(str(tmp_path / "log.txt"), log_fields))
    return trainer, g, d


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    """One full tiny progressive run shared by the assertions below."""
    tmp_path = tmp_path_factory.mktemp("e2e")
    dataset = SyntheticDataset(resolution=RES, num_channels=1, num_items=32)
    trainer, g, d = build_trainer(tmp_path, dataset)
    trainer.run(total_kimg=0.8)  # 800 imgs: depth 0 stable, depth 1 fade+part
    return tmp_path, trainer


def test_training_progresses(run_dir):
    tmp_path, trainer = run_dir
    assert trainer.cur_nimg >= 800
    assert trainer.cur_tick >= 3
    # 800 imgs with 192/192 stages: full=2 passes(768), depth = 2
    assert trainer.depth == 2
    assert trainer.stats["depth"] == 2


def test_losses_finite(run_dir):
    _, trainer = run_dir
    for name in ("G_loss", "D_loss", "D_real", "D_fake"):
        assert np.isfinite(trainer.stats[name]["epoch_mean"]), name


def test_log_file_written(run_dir):
    tmp_path, trainer = run_dir
    lines = open(tmp_path / "log.txt").read().strip().splitlines()
    assert len(lines) == trainer.cur_tick
    assert "tick" in lines[0] and "kimg" in lines[0]
    assert "depth" in lines[-1]


def test_metrics_jsonl(run_dir):
    import json
    tmp_path, trainer = run_dir
    rows = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert len(rows) == trainer.cur_tick
    assert "G_loss.epoch_mean" in rows[-1]
    assert rows[-1]["depth"] == trainer.depth


def test_snapshots_and_samples(run_dir):
    tmp_path, trainer = run_dir
    gens = glob.glob(str(tmp_path / "network-snapshot-generator-*.dat"))
    discs = glob.glob(str(tmp_path / "network-snapshot-discriminator-*.dat"))
    states = glob.glob(str(tmp_path / "training-state-*.dat"))
    assert len(gens) == 1 and len(discs) == 1 and len(states) == 1  # keep-last
    pngs = glob.glob(str(tmp_path / "samples" / "fakes_*.png"))
    assert len(pngs) >= 1


def test_snapshot_roundtrip(run_dir):
    tmp_path, trainer = run_dir
    path = glob.glob(str(tmp_path / "network-snapshot-generator-*.dat"))[0]
    model, params, meta = load_snapshot(path)
    assert meta["model_class"] == "Generator"
    assert meta["depth"] == trainer.depth
    z = random_latents(2, model.latent_size)
    out = model.apply(params, z, meta["depth"], meta["alpha"])
    res = 4 * 2 ** meta["depth"]
    assert out.shape == (2, res, res, 1)
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(trainer.G.apply(trainer.state.g_params, z,
                                   trainer.depth, trainer.alpha)),
        rtol=1e-5, atol=1e-6)


def test_resume_restores_schedule_position(run_dir, tmp_path):
    run_path, trainer = run_dir
    state_path = glob.glob(str(run_path / "training-state-*.dat"))[0]
    state, cur_nimg, iterations, base_time = load_training_state(state_path)
    # cumulative wall-clock persisted for AbsoluteTimeMonitor continuity
    assert base_time > 0.0
    assert cur_nimg == trainer.cur_nimg
    dataset = SyntheticDataset(resolution=RES, num_channels=1, num_items=32)
    trainer2, _, _ = build_trainer(tmp_path, dataset, resume_nimg=cur_nimg,
                                   resume_state=(state, iterations))
    # DepthManager (registered in build_trainer) must re-derive the same stage
    assert trainer2.depth == trainer.depth
    assert trainer2.cur_nimg == cur_nimg
    # and training continues without error
    trainer2.run(total_kimg=(cur_nimg + 64) / 1000)
    assert trainer2.cur_nimg > cur_nimg


def test_non_progressive_mode(tmp_path):
    """--progressive_growing False equivalent: no DepthManager; fixed depth
    (reference README.md:48, train.py:167-169)."""
    dataset = SyntheticDataset(resolution=RES, num_channels=1, num_items=16)
    dataset.model_depth = 2  # fixed full depth
    g = Generator(dataset.shape, latent_size=16, fmap_base=64, fmap_max=32)
    d = Discriminator(dataset.shape, fmap_base=64, fmap_max=32)
    opt = make_optimizer()
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    state = init_state(g.init(keys[0]), d.init(keys[1]), opt, keys[2])
    builder = TrainStepBuilder(g, d, opt)
    it = DataIterator(dataset, 8, num_workers=1, seed=0)
    trainer = Trainer(g, d, builder, state, dataset, iter(it),
                      lambda: random_latents(8, 16),
                      tick_nimg_default=64)
    trainer.depth = 2
    trainer.lr_d = trainer.lr_g = 1e-3
    trainer.run(total_kimg=0.2)
    assert trainer.depth == 2
    assert trainer.cur_nimg >= 200
    it.close()
