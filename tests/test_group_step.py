"""Grouped dispatch (``Trainer.steps_per_dispatch`` / ``group_step_fn``):
scanning N consecutive train steps into ONE compiled program must be
step-for-step EXACT vs per-step dispatch — same parameter trajectory, same
per-step metrics, same nimg/tick/schedule accounting. The grouping is a
host-dispatch-overhead optimization only (steps.py _build_group_step).
"""

import math

import jax
import numpy as np
import pytest

from pggan_tpu.models import Discriminator, Generator
from pggan_tpu.training import TrainStepBuilder, Trainer, make_optimizer
from pggan_tpu.training.plugins import (
    DepthManager,
    EfficientLossMonitor,
    LRScheduler,
)
from pggan_tpu.training.schedule import (
    depth_alpha_schedule,
    fade_nimg_horizon,
    stable_nimg_horizon,
)
from pggan_tpu.training.state import init_state
from pggan_tpu.utils.misc import random_latents


# -- the pure horizon law ---------------------------------------------------

def test_horizon_matches_schedule_law():
    """For every probe nimg: the schedule is constant on [n, n+N) and (for
    finite N) changes at exactly n + N."""
    max_depth, tr, fa = 3, 96, 96
    probes = list(range(0, (max_depth + 2) * (tr + fa), 17)) + [
        0, tr - 1, tr, tr + fa - 1, tr + fa, max_depth * (tr + fa)]
    for n in probes:
        horizon = stable_nimg_horizon(n, max_depth, tr, fa)
        here = depth_alpha_schedule(n, max_depth, tr, fa)
        if math.isinf(horizon):
            for k in (1, 7, 1000, 10 * (tr + fa)):
                assert depth_alpha_schedule(n + k, max_depth, tr, fa) == here
            continue
        horizon = int(horizon)
        for k in range(0, horizon, max(1, horizon // 7)):
            assert depth_alpha_schedule(n + k, max_depth, tr, fa) == here, (
                n, k)
        # the output changes at the window end (horizon 0 = inside a fade,
        # where alpha moves at the very next image)
        assert depth_alpha_schedule(
            n + max(horizon, 1), max_depth, tr, fa) != here, n


def test_horizon_fade_is_zero():
    assert stable_nimg_horizon(96, 8, 96, 96) == 0
    assert stable_nimg_horizon(150, 8, 96, 96) == 0
    assert stable_nimg_horizon(0, 8, 96, 96) == 96
    assert stable_nimg_horizon(95, 8, 96, 96) == 1
    assert math.isinf(stable_nimg_horizon(8 * 192, 8, 96, 96))


def test_fade_horizon_law():
    """fade_nimg_horizon N: alpha < 1.0 at constant depth on [n, n+N), and
    alpha == 1.0 (stable) at exactly n + N; 0 outside fades."""
    max_depth, tr, fa = 3, 96, 64
    period = tr + fa
    for n in range(0, (max_depth + 2) * period, 13):
        nf = fade_nimg_horizon(n, max_depth, tr, fa)
        d0, a0 = depth_alpha_schedule(n, max_depth, tr, fa)
        if a0 < 1.0:
            assert nf > 0, n
            for k in range(0, nf, max(1, nf // 7)):
                d, a = depth_alpha_schedule(n + k, max_depth, tr, fa)
                assert d == d0 and a < 1.0, (n, k)
            assert depth_alpha_schedule(n + nf, max_depth, tr, fa)[1] == 1.0
        else:
            assert nf == 0, n
    # stable phases and the post-clamp terminal phase report 0
    assert fade_nimg_horizon(0, max_depth, tr, fa) == 0
    assert fade_nimg_horizon(max_depth * period + tr + 5,
                             max_depth, tr, fa) == 0
    # exactly at fade start / one before fade end
    assert fade_nimg_horizon(tr, max_depth, tr, fa) == fa
    assert fade_nimg_horizon(period - 1, max_depth, tr, fa) == 1


# -- direct step-builder exactness ------------------------------------------

@pytest.fixture(scope="module")
def tiny():
    shape = (1, 1, 16, 16)
    G = Generator(shape, latent_size=16, fmap_base=64, fmap_max=32)
    D = Discriminator(shape, fmap_base=64, fmap_max=32)
    opt = make_optimizer()
    keys = jax.random.split(jax.random.PRNGKey(7), 3)
    state = init_state(G.init(keys[0]), D.init(keys[1]), opt, keys[2])
    return G, D, opt, state


def test_group_step_matches_per_step(tiny):
    G, D, opt, state0 = tiny
    builder = TrainStepBuilder(G, D, opt)
    depth, batch, group = 1, 4, 3
    rng = np.random.RandomState(0)
    reals = rng.randn(
        group, *builder.real_batch_shape(depth, batch)).astype(np.float32)
    alphas = np.full((group,), 1.0, np.float32)
    lrs = np.asarray([1e-3, 8e-4, 6e-4], np.float32)

    # per-step reference trajectory
    step = builder.step_fn(depth, batch, fade=False)
    state = jax.tree_util.tree_map(np.copy, state0)
    per_metrics = []
    for k in range(group):
        state, m = step(state, reals[k], alphas[k], lrs[k], lrs[k])
        per_metrics.append(jax.device_get(m))
    ref_params = jax.device_get(state.g_params)

    # one grouped dispatch
    gstep = builder.group_step_fn(depth, batch, False, group)
    gstate, gm = gstep(jax.tree_util.tree_map(np.copy, state0),
                       reals, alphas, lrs, lrs)
    gm = jax.device_get(gm)

    for k in range(group):
        for key in ("G_loss", "D_loss", "D_real", "D_fake"):
            np.testing.assert_allclose(gm[key][k], per_metrics[k][key],
                                       rtol=2e-5, atol=2e-6, err_msg=key)
    # scan-vs-unrolled XLA fusion reassociates a few fp32 reductions;
    # observed worst case 6e-5 relative on 1/9216 elements
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), b,
                                                rtol=2e-4, atol=2e-5),
        jax.device_get(gstate.g_params), ref_params)


def test_group_step_unrolled_matches_rolled(tiny, monkeypatch):
    """PGGAN_GROUP_UNROLL (steps.py) trades the rolled scan's carry copies
    for compile time; numerics must be identical up to fp32 reassociation
    noise. Pins the claim the knob's comment makes, so flipping the default
    after a TPU A/B (BASELINE.md) can't change trajectories."""
    G, D, opt, state0 = tiny
    depth, batch, group = 1, 4, 3
    rng = np.random.RandomState(1)
    builder = TrainStepBuilder(G, D, opt)
    reals = rng.randn(
        group, *builder.real_batch_shape(depth, batch)).astype(np.float32)
    alphas = np.full((group,), 1.0, np.float32)
    lrs = np.full((group,), 1e-3, np.float32)

    outs = {}
    for unroll in ("1", "8"):  # 8 > group: min() clamps to a full unroll
        monkeypatch.setenv("PGGAN_GROUP_UNROLL", unroll)
        gstep = TrainStepBuilder(G, D, opt).group_step_fn(
            depth, batch, False, group)
        st, m = gstep(jax.tree_util.tree_map(np.copy, state0),
                      reals, alphas, lrs, lrs)
        outs[unroll] = (jax.device_get(st.g_params), jax.device_get(m))

    (p1, m1), (p8, m8) = outs["1"], outs["8"]
    for key in ("G_loss", "D_loss", "D_real", "D_fake"):
        np.testing.assert_allclose(m8[key], m1[key], rtol=2e-5, atol=2e-6,
                                   err_msg=key)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), b,
                                                rtol=2e-4, atol=2e-5),
        p8, p1)


def test_prep_vector_alpha_matches_scalar(tiny):
    """Device-side input prep with a per-step alpha VECTOR (grouped fade
    dispatch) must equal per-step scalar prep — the vector broadcasts over
    the leading group dim, not numpy-style over trailing dims."""
    G, D, opt, _ = tiny
    builder = TrainStepBuilder(G, D, opt)
    prep = builder.prep_fn((0, 255), (-1, 1))
    u8 = np.random.RandomState(0).randint(
        0, 256, (3, 1, 4, 8, 8, 1), dtype=np.uint8)
    alphas = np.asarray([0.0, 0.4, 1.0], np.float32)
    grouped = np.asarray(prep(u8, alphas))
    for k, a in enumerate(alphas):
        np.testing.assert_allclose(
            grouped[k], np.asarray(prep(u8[k], np.float32(a))),
            rtol=1e-6, atol=1e-6, err_msg=f"step {k} alpha {a}")


# -- trainer-level gating ----------------------------------------------------

class _Stub:
    mesh = None


def _bare_trainer(**kw):
    t = Trainer(None, None, _Stub(), None, None, iter(()), None, **kw)
    return t


def test_plan_group_gating():
    t = _bare_trainer(steps_per_dispatch=4)
    t.minibatch_size = 8

    def plan():
        group, alphas = t._plan_group()
        # the plan's alpha vector contract: a validated per-step vector for
        # grouped fade windows, None otherwise
        if group > 1 and t.alpha < 1.0:
            assert alphas is not None and alphas.shape == (group,)
        else:
            assert alphas is None
        return group

    # no horizon hook installed -> grouping stays off
    assert plan() == 1
    t.schedule_horizon = lambda nimg: math.inf
    assert plan() == 4
    # fade: groups only when the fade hooks are installed AND the whole
    # window stays strictly inside the fade (last step's alpha < 1 at
    # nimg = start + (spd-1)*per = 24 here)
    t.alpha = 0.5
    assert plan() == 1  # no fade hooks -> per-step
    t.alpha_lookahead = lambda nimg: (0, 0.5)
    t.fade_horizon = lambda nimg: 3 * 8  # == (spd-1)*per: last step hits 1.0
    assert plan() == 1
    t.fade_horizon = lambda nimg: 3 * 8 + 1
    assert plan() == 4
    t.alpha = 1.0
    # horizon shorter than the full group window -> per-step
    t.schedule_horizon = lambda nimg: 4 * 8 - 1
    assert plan() == 1
    t.schedule_horizon = lambda nimg: 4 * 8
    assert plan() == 4
    # tick boundary: fewer than 4 steps remaining -> per-step (a smaller
    # group would compile a fresh program per residual length)
    t.schedule_horizon = lambda nimg: math.inf
    t.tick_duration_nimg = 3 * 8
    assert plan() == 1
    t.tick_duration_nimg = 4 * 8
    assert plan() == 4
    # run-end boundary
    t.total_nimg = 2 * 8
    assert plan() == 1
    t.total_nimg = None
    # spd=1 disables
    t.steps_per_dispatch = 1
    assert plan() == 1


# -- trainer-level end-to-end equivalence -----------------------------------

def _make_trainer(spd, lod_nimg=96, tick_nimg=96, seed=3):
    shape = (1, 1, 16, 16)
    G = Generator(shape, latent_size=16, fmap_base=64, fmap_max=32)
    D = Discriminator(shape, fmap_base=64, fmap_max=32)
    opt = make_optimizer()
    keys = jax.random.split(jax.random.PRNGKey(seed), 3)
    state = init_state(G.init(keys[0]), D.init(keys[1]), opt, keys[2])
    builder = TrainStepBuilder(G, D, opt)

    calls = []

    def make_iter(bs):
        # deterministic data stream: the n-th iterator created serves
        # RandomState(100+n) batches — identical across both runs because
        # stage changes happen at identical nimg points
        r = np.random.RandomState(100 + len(calls))
        calls.append(bs)

        def gen():
            while True:
                depth = current_depth[0]
                res = G.resolution_at(depth)
                yield r.randn(bs, res, res, 1).astype(np.float32)

        return gen()

    current_depth = [0]
    trainer = Trainer(G, D, builder, state, None, None,
                      lambda: random_latents(4, 16),
                      tick_nimg_default=tick_nimg,
                      steps_per_dispatch=spd)

    class _DM(DepthManager):
        def iteration(self, *a):
            super().iteration(*a)
            current_depth[0] = self.depth

    dm = _DM(make_iter, None, max_depth=2,
             minibatch_default=8, minibatch_overrides={},
             tick_kimg_default=tick_nimg / 1000, tick_kimg_overrides={},
             lod_training_nimg=lod_nimg, lod_transition_nimg=lod_nimg)
    trainer.register_plugin(dm)
    for i, name in enumerate(["G_loss", "D_loss", "D_real", "D_fake"]):
        trainer.register_plugin(EfficientLossMonitor(i, name))
    trainer.register_plugin(LRScheduler(1e-3, 1e-3, rampup_kimg=0.25))
    return trainer


def test_trainer_grouped_equals_per_step():
    """A full tiny progressive run (stable + fade + stable windows) with
    steps_per_dispatch=4 matches the per-step run: same schedule trajectory,
    same nimg/tick accounting, same final params (numerics identical up to
    XLA fusion differences), same per-tick loss means."""
    a = _make_trainer(spd=1)
    b = _make_trainer(spd=4)
    a.run(total_kimg=0.4)  # 400 imgs: depth0 stable, fade, depth1 stable...
    b.run(total_kimg=0.4)

    assert a.cur_nimg == b.cur_nimg
    assert a.iterations == b.iterations
    assert a.cur_tick == b.cur_tick
    assert (a.depth, a.alpha) == (b.depth, b.alpha)
    # grouped mode really engaged, in BOTH phases: 4-tuple step-cache keys
    # exist for a stable (fade=False) and a fade (fade=True) window
    assert any(len(k) == 4 and k[2] is False
               for k in b.builder._step_cache), (
        "grouped stable program never compiled — gating too strict")
    assert any(len(k) == 4 and k[2] is True
               for k in b.builder._step_cache), (
        "grouped fade program never compiled — fade gating too strict")
    # numerics: fp32 reassociation noise (scan vs unrolled fusion) compounds
    # through 50 adversarial steps — the TIGHT per-step equivalence is
    # test_group_step_matches_per_step; here we sanity-bound the drift
    for name in ("G_loss", "D_loss"):
        ma = a.stats[name]["epoch_mean"]
        mb = b.stats[name]["epoch_mean"]
        np.testing.assert_allclose(ma, mb, rtol=0.15, atol=0.05,
                                   err_msg=name)
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=0.15, atol=0.05),
        jax.device_get(a.state.g_params), jax.device_get(b.state.g_params))


def test_grouped_sharded_runs():
    """Grouped dispatch under the 8-device mesh: compiles, runs, and the
    batch axis of the (group, R, B, ...) input shards on dim 2."""
    from pggan_tpu.parallel.mesh import data_parallel_mesh
    shape = (1, 1, 16, 16)
    G = Generator(shape, latent_size=16, fmap_base=64, fmap_max=32)
    D = Discriminator(shape, fmap_base=64, fmap_max=32)
    opt = make_optimizer()
    keys = jax.random.split(jax.random.PRNGKey(11), 3)
    state = init_state(G.init(keys[0]), D.init(keys[1]), opt, keys[2])
    mesh = data_parallel_mesh()
    builder = TrainStepBuilder(G, D, opt, mesh=mesh)
    group, batch = 2, 8
    gstep = builder.group_step_fn(1, batch, False, group)
    reals = np.random.RandomState(0).randn(
        group, *builder.real_batch_shape(1, batch)).astype(np.float32)
    ones = np.ones((group,), np.float32)
    state, metrics = gstep(state, reals, ones, 1e-3 * ones, 1e-3 * ones)
    assert jax.device_get(metrics["G_loss"]).shape == (group,)
    assert np.all(np.isfinite(jax.device_get(metrics["D_loss"])))


# -- dispatch backpressure ----------------------------------------------------

class _Handle:
    """Fake device-array output: records when the trainer materializes it."""

    def __init__(self, log, tag):
        self._log, self._tag = log, tag

    def __array__(self, dtype=None, copy=None):
        self._log.append(self._tag)
        return np.zeros((), np.float32)


def test_inflight_throttle_bounds_bytes_and_fetches_oldest():
    """``inflight_budget_mb``: once the input bytes of unfinished dispatches
    exceed the budget, the OLDEST dispatch is forced to completion with a
    real host fetch (np.asarray) — bounding memory pinned by pending
    dispatches on a lagging device (see the scope note in Trainer.__init__:
    the axon tunnel client's unconditional literal leak is OUTSIDE what this
    can reclaim). Small batches below the budget must never trigger a
    fetch."""
    t = _bare_trainer(inflight_budget_mb=1)  # 1 MiB budget
    fetched = []

    def dispatch(tag, nbytes):
        t._throttle_inflight({"D_loss": _Handle(fetched, tag)}, nbytes)

    # small dispatches: stay under budget, zero sync overhead
    for k in range(8):
        dispatch(f"small{k}", 1024)
    assert fetched == []
    assert len(t._inflight) == 8
    # big dispatches: budget binds; oldest handles are materialized first
    dispatch("big0", 900 * 1024)
    assert fetched == []  # 900K + 8K <= 1 MiB
    dispatch("big1", 900 * 1024)
    assert fetched[:8] == [f"small{k}" for k in range(8)]
    assert "big0" in fetched  # drained until back under budget
    # invariant: at least one dispatch always stays in flight (pipelining)
    dispatch("huge", 10 * 1024 * 1024)
    assert len(t._inflight) >= 1
    assert t._inflight_bytes == sum(b for _, b in t._inflight)


def test_inflight_throttle_disabled():
    t = _bare_trainer(inflight_budget_mb=0)
    fetched = []
    for k in range(4):
        t._throttle_inflight({"D_loss": _Handle(fetched, k)},
                             100 * 1024 * 1024)
    assert fetched == [] and len(t._inflight) == 0
