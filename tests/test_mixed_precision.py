"""Mixed-precision (bf16 compute) mode: numerics stay close to f32, params
stay f32, and the full grad-of-grad train step runs."""

import jax
import jax.numpy as jnp
import numpy as np

from pggan_tpu.models import Discriminator, Generator
from pggan_tpu.training.state import init_state, make_optimizer
from pggan_tpu.training.steps import TrainStepBuilder

SHAPE = (16, 1, 16, 16)


def _models(compute_dtype):
    g = Generator(SHAPE, latent_size=16, fmap_base=64, fmap_max=32,
                  compute_dtype=compute_dtype)
    d = Discriminator(SHAPE, fmap_base=64, fmap_max=32,
                      compute_dtype=compute_dtype)
    return g, d


def test_bf16_forward_close_to_f32():
    g32, d32 = _models("float32")
    g16, d16 = _models("bfloat16")
    gp = g32.init(jax.random.PRNGKey(0))
    dp = d32.init(jax.random.PRNGKey(1))
    z = jax.random.normal(jax.random.PRNGKey(2), (4, 16))
    img32 = np.asarray(g32.apply(gp, z, 2, 0.7))
    img16 = np.asarray(g16.apply(gp, z, 2, 0.7))
    assert img16.dtype == np.float32  # images surface as f32
    # bf16 has ~3 decimal digits; pixelnorm keeps activations O(1)
    assert np.max(np.abs(img32 - img16)) < 0.15
    s32 = np.asarray(d32.apply(dp, jnp.asarray(img32), 2, 0.7))
    s16 = np.asarray(d16.apply(dp, jnp.asarray(img32), 2, 0.7))
    assert np.max(np.abs(s32 - s16)) < 0.2 * (1 + np.max(np.abs(s32)))


def test_bf16_params_stay_f32():
    g16, _ = _models("bfloat16")
    params = g16.init(jax.random.PRNGKey(0))
    for leaf in jax.tree_util.tree_leaves(params):
        assert leaf.dtype == jnp.float32


def test_bf16_train_step_runs_and_is_finite():
    g, d = _models("bfloat16")
    opt = make_optimizer()
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    state = init_state(g.init(keys[0]), d.init(keys[1]), opt, keys[2])
    builder = TrainStepBuilder(g, d, opt)
    step = builder.step_fn(depth=2, batch_size=8)
    reals = np.random.RandomState(0).randn(1, 8, 16, 16, 1).astype(np.float32)
    for _ in range(3):
        state, metrics = step(state, reals, np.float32(0.5),
                              np.float32(1e-3), np.float32(1e-3))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    for leaf in jax.tree_util.tree_leaves(state.g_params):
        assert leaf.dtype == jnp.float32
        assert np.isfinite(np.asarray(leaf)).all()


def test_bf16_snapshot_config_roundtrip(tmp_path):
    from pggan_tpu.checkpoint import load_snapshot, save_snapshot
    g, _ = _models("bfloat16")
    params = g.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "snap.dat")
    save_snapshot(path, g, params, 2, 1.0)
    model, p2, meta = load_snapshot(path)
    assert model.compute_dtype == "bfloat16"
    z = np.random.RandomState(0).randn(2, 16).astype(np.float32)
    np.testing.assert_allclose(np.asarray(g.apply(params, z, 2, 1.0)),
                               np.asarray(model.apply(p2, z, 2, 1.0)),
                               rtol=1e-5)
