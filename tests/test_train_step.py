"""Fused train step: single-device correctness and data-parallel equivalence
on the virtual 8-device CPU mesh (SURVEY.md §4 "distributed tests without a
cluster")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pggan_tpu.models import Discriminator, Generator
from pggan_tpu.training.state import init_state, make_optimizer
from pggan_tpu.training.steps import TrainStepBuilder

SHAPE = (64, 1, 16, 16)


def tiny_models():
    g = Generator(SHAPE, latent_size=16, fmap_base=64, fmap_max=32)
    d = Discriminator(SHAPE, fmap_base=64, fmap_max=32)
    return g, d


def fresh_state(g, d, opt, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), 3)
    return init_state(g.init(keys[0]), d.init(keys[1]), opt, keys[2])


def test_step_runs_and_updates_params():
    g, d = tiny_models()
    opt = make_optimizer()
    state = fresh_state(g, d, opt)
    builder = TrainStepBuilder(g, d, opt)
    step = builder.step_fn(depth=1, batch_size=8)
    reals = np.random.RandomState(0).randn(1, 8, 8, 8, 1).astype(np.float32)

    g0 = jax.device_get(state.g_params["block0"]["c1"]["w"])
    d0 = jax.device_get(state.d_params["linear"]["w"])
    state, metrics = step(state, reals, np.float32(0.5),
                          np.float32(1e-3), np.float32(1e-3))
    for k in ("G_loss", "D_loss", "D_real", "D_fake"):
        assert np.isfinite(float(metrics[k])), k
    assert not np.allclose(jax.device_get(state.g_params["block0"]["c1"]["w"]), g0)
    assert not np.allclose(jax.device_get(state.d_params["linear"]["w"]), d0)


def test_step_zero_lr_freezes_params():
    g, d = tiny_models()
    opt = make_optimizer()
    state = fresh_state(g, d, opt)
    builder = TrainStepBuilder(g, d, opt)
    step = builder.step_fn(depth=0, batch_size=4)
    reals = np.random.RandomState(1).randn(1, 4, 4, 4, 1).astype(np.float32)
    g0 = jax.device_get(state.g_params)
    state, _ = step(state, reals, np.float32(1.0),
                    np.float32(0.0), np.float32(0.0))
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(jax.device_get(state.g_params))):
        np.testing.assert_array_equal(a, b)


def test_d_repeats_scan():
    g, d = tiny_models()
    opt = make_optimizer()
    state = fresh_state(g, d, opt)
    builder = TrainStepBuilder(g, d, opt, d_training_repeats=3)
    step = builder.step_fn(depth=0, batch_size=4)
    assert builder.real_batch_shape(0, 4) == (3, 4, 4, 4, 1)
    reals = np.random.RandomState(2).randn(3, 4, 4, 4, 1).astype(np.float32)
    state, metrics = step(state, reals, np.float32(1.0),
                          np.float32(1e-3), np.float32(1e-3))
    assert np.isfinite(float(metrics["D_loss"]))


def test_sharded_step_matches_single_device():
    """Data-parallel step over an 8-device mesh must match the single-device
    step bit-for-bit in semantics (global minibatch-stddev + GP + grad
    all-reduce handled by GSPMD) within float tolerance."""
    from jax.sharding import Mesh

    g, d = tiny_models()
    opt = make_optimizer()

    reals = np.random.RandomState(3).randn(1, 16, 4, 4, 1).astype(np.float32)

    # single device
    state1 = fresh_state(g, d, opt, seed=7)
    b1 = TrainStepBuilder(g, d, opt)
    s1 = b1.step_fn(0, 16)
    state1, m1 = s1(state1, reals, np.float32(1.0),
                    np.float32(1e-3), np.float32(1e-3))

    # 8-device data-parallel mesh
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    state8 = fresh_state(g, d, opt, seed=7)
    b8 = TrainStepBuilder(g, d, opt, mesh=mesh)
    s8 = b8.step_fn(0, 16)
    state8, m8 = s8(state8, reals, np.float32(1.0),
                    np.float32(1e-3), np.float32(1e-3))

    np.testing.assert_allclose(float(m1["D_loss"]), float(m8["D_loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(m1["G_loss"]), float(m8["G_loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(state1.g_params)),
                    jax.tree_util.tree_leaves(jax.device_get(state8.g_params))):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)


def test_metrics_match_reference_loss_structure():
    """D_loss must equal mean(D_fake_loss + D_real_loss + GP) construction:
    check D_real/D_fake signs behave (D_real enters cost negatively)."""
    g, d = tiny_models()
    opt = make_optimizer()
    state = fresh_state(g, d, opt)
    builder = TrainStepBuilder(g, d, opt)
    step = builder.step_fn(depth=0, batch_size=8)
    reals = np.random.RandomState(4).randn(1, 8, 4, 4, 1).astype(np.float32)
    _, metrics = step(state, reals, np.float32(1.0),
                      np.float32(0.0), np.float32(0.0))
    # metrics are device scalars convertible to python floats
    assert isinstance(float(metrics["D_real"]), float)


def test_sample_fn():
    g, d = tiny_models()
    builder = TrainStepBuilder(g, d, make_optimizer())
    params = g.init(jax.random.PRNGKey(0))
    z = np.random.RandomState(5).randn(3, 16).astype(np.float32)
    out = builder.sample_fn(2)(params, z, np.float32(0.5))
    assert out.shape == (3, 16, 16, 1)


def test_device_prep_matches_host_prep():
    """Device-side uint8 fade+remap must equal the host loader's prep."""
    from pggan_tpu.data import native
    g, d = tiny_models()
    builder = TrainStepBuilder(g, d, make_optimizer())
    rng = np.random.RandomState(7)
    u8 = rng.randint(0, 256, (1, 4, 8, 8, 1), dtype=np.uint8)
    for alpha in (1.0, 0.5, 0.0):
        dev = np.asarray(builder.prep_fn()(u8, np.float32(alpha)))
        host = native.prep_batch_f32(u8[0], alpha)
        np.testing.assert_allclose(dev[0], host, atol=1e-4)


def test_trainer_accepts_uint8_batches(tmp_path):
    """End-to-end: loader raw mode -> device prep -> fused step."""
    import jax
    from pggan_tpu.data import DataIterator, SyntheticDataset
    from pggan_tpu.training.trainer import Trainer
    from pggan_tpu.training.state import init_state

    ds = SyntheticDataset(resolution=16, num_channels=1, num_items=16)
    ds.model_depth = 1
    g, d = tiny_models()
    opt = make_optimizer()
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    state = init_state(g.init(keys[0]), d.init(keys[1]), opt, keys[2])
    builder = TrainStepBuilder(g, d, opt)
    it = DataIterator(ds, 4, num_workers=1, seed=0, raw=True)
    b = next(it)
    assert b.dtype == np.uint8
    trainer = Trainer(g, d, builder, state, ds, iter(it), lambda: None,
                      tick_nimg_default=64)
    trainer.depth = 1
    trainer.lr_d = trainer.lr_g = 1e-3
    trainer.run(total_kimg=0.1)
    assert trainer.cur_nimg >= 100
    it.close()


def test_fit_minibatch_to_mesh_policy():
    """Pod batch policy (parallel/mesh.py): round each reference global
    batch UP to a mesh multiple, never down, and report what changed."""
    from jax.sharding import Mesh
    from pggan_tpu.parallel.mesh import fit_minibatch_to_mesh

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    d, o, ch = fit_minibatch_to_mesh(16, {6: 14, 7: 6, 8: 3}, mesh)
    assert d == 16
    assert o == {6: 16, 7: 8, 8: 8}
    assert ch == {6: (14, 16), 7: (6, 8), 8: (3, 8)}
    assert all(new >= old for old, new in ch.values())  # never below ref

    d2, o2, ch2 = fit_minibatch_to_mesh(8, {1: 8}, mesh)  # already divisible
    assert (d2, o2, ch2) == (8, {1: 8}, {})
