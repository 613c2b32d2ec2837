"""The fused G+D train step: one jit-compiled XLA program per
(depth, batch_size) doing D-repeats then the G update.

TPU-first re-design of the reference hot loop (trainer.py:85-115), which ran
4 separate forward passes, 2 backwards and 2 optimizer steps as eager CUDA
calls. Here the whole iteration — latent sampling, D loss with grad-of-grad
gradient penalty, Adam update, G loss, Adam update — is a single traced
program: XLA fuses elementwise work into the convs, state buffers are
donated (no reallocation per step), and latents come from the on-device PRNG
(no host->device transfer per iteration; the reference paid one per batch,
trainer.py:86,92,103).

``depth`` and ``batch_size`` are static (a stage change is a recompilation
boundary, SURVEY.md §3.3); ``alpha`` and the learning rates are traced
scalars so fade-in and LR ramp never recompile.

Under a data-parallel mesh the batch axis of ``reals`` is sharded and params
are replicated; XLA's GSPMD inserts the gradient all-reduce and the
cross-replica reductions inside minibatch-stddev and the gradient-penalty
mean automatically (SURVEY.md §2.8 items 1-2).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pggan_tpu.losses import wgan_gp_D_loss, wgan_gp_G_loss
from pggan_tpu.training.state import TrainState, apply_updates


class TrainStepBuilder:
    """Builds and caches jitted train steps keyed by (depth, batch_size).

    Also builds the per-depth sampling functions used by OutputGenerator and
    the ``generate`` CLI.
    """

    def __init__(self, G, D, optimizer: optax.GradientTransformation,
                 d_training_repeats: int = 1,
                 iwass_lambda: float = 10.0,
                 iwass_epsilon: float = 0.001,
                 iwass_target: float = 1.0,
                 mesh=None,
                 batch_axis: str = "data",
                 g_ema_beta: float | None = None):
        self.G = G
        self.D = D
        self.optimizer = optimizer
        self.d_training_repeats = int(d_training_repeats)
        self.iwass_lambda = float(iwass_lambda)
        self.iwass_epsilon = float(iwass_epsilon)
        self.iwass_target = float(iwass_target)
        # per-step generator EMA decay (Karras' Gs smoothing; the reference
        # has none). Updated INSIDE the raw step, so grouped dispatch applies
        # it exactly per step through the scan.
        self.g_ema_beta = (None if g_ema_beta is None or g_ema_beta <= 0
                           else float(g_ema_beta))
        self.mesh = mesh
        self.batch_axis = batch_axis
        if mesh is not None:
            # Pallas heads/tails must know the mesh: pallas_call is opaque
            # to GSPMD, so the models wrap their NCHW subgraphs in shard_map
            # over the batch axis (ops/spatial.py shard_map_batch).
            D.mesh = mesh
            D.batch_axis = batch_axis
            G.mesh = mesh
            G.batch_axis = batch_axis
        self._step_cache: dict[tuple[int, int], Callable] = {}
        self._sample_cache: dict[int, Callable] = {}

    # -- shardings ----------------------------------------------------------
    def _shardings(self):
        from jax.sharding import NamedSharding, PartitionSpec as P
        replicated = NamedSharding(self.mesh, P())
        batch = NamedSharding(self.mesh, P(None, self.batch_axis))
        return replicated, batch

    # -- the step -----------------------------------------------------------
    def _raw_step(self, depth: int, batch_size: int,
                  fade: bool = True) -> Callable:
        """The un-jitted (state, reals, alpha, lr_d, lr_g) -> (state, metrics)
        function; jitted directly by ``step_fn`` or scanned over a step group
        by ``group_step_fn``."""
        G, D = self.G, self.D
        opt = self.optimizer
        latent_size = G.latent_size
        lam, eps_drift, target = (self.iwass_lambda, self.iwass_epsilon,
                                  self.iwass_target)

        def step(state: TrainState, reals: jax.Array, alpha: jax.Array,
                 lr_d: jax.Array, lr_g: jax.Array):
            def d_apply(p, x):
                return D.apply(p, x, depth, alpha, fade)

            def d_apply_pair(p, x2):
                # reals+fakes scored in ONE pass; stat_groups=2 keeps the
                # minibatch-stddev statistic per-half — exactly equal to
                # two separate d_apply calls (losses.py)
                return D.apply(p, x2, depth, alpha, fade, stat_groups=2)

            def g_apply(p, z):
                return G.apply(p, z, depth, alpha, fade)

            # The merged real+fake critic pass runs SINGLE-CHIP only: under
            # a sharded mesh, concatenating along the sharded batch axis
            # forces GSPMD to reshuffle both halves across devices (profiled:
            # activation-sized all-to-alls from jvp()/concatenate plus
            # collective-permutes re-slicing the scores — caught by
            # tests/test_collective_audit.py), while on one chip it just
            # halves the D-forward op count (measured perf-neutral).
            # PGGAN_MERGED_D=0 forces it off for A/B. Equal numerics either way.
            import os
            pair = (d_apply_pair if self.mesh is None and
                    os.environ.get("PGGAN_MERGED_D", "1") != "0" else None)

            def d_loss_fn(d_params, real, z, key):
                return wgan_gp_D_loss(d_apply, g_apply, d_params,
                                      state.g_params, real, z, key,
                                      lam, eps_drift, target,
                                      d_apply_pair=pair)

            def d_phase(carry, real):
                d_params, d_opt, rng = carry
                rng, kz, kgp = jax.random.split(rng, 3)
                z = jax.random.normal(kz, (batch_size, latent_size),
                                      jnp.float32)
                (cost, (d_real, d_fake)), grads = jax.value_and_grad(
                    d_loss_fn, has_aux=True)(d_params, real, z, kgp)
                updates, d_opt = opt.update(grads, d_opt, d_params)
                d_params = apply_updates(d_params, updates, lr_d)
                return (d_params, d_opt, rng), (cost, d_real, d_fake)

            carry = (state.d_params, state.d_opt, state.rng)
            if self.d_training_repeats == 1:
                # scan would wrap the whole D phase in an XLA while loop —
                # an optimization barrier the default single-repeat config
                # doesn't need
                (d_params, d_opt, rng), (cost1, dr1, df1) = d_phase(
                    carry, reals[0])
                costs, drs, dfs = (jnp.expand_dims(cost1, 0),
                                   jnp.expand_dims(dr1, 0),
                                   jnp.expand_dims(df1, 0))
            else:
                (d_params, d_opt, rng), (costs, drs, dfs) = jax.lax.scan(
                    d_phase, carry, reals)

            rng, kz = jax.random.split(rng)
            z = jax.random.normal(kz, (batch_size, latent_size), jnp.float32)

            def g_loss_fn(g_params):
                return wgan_gp_G_loss(g_apply, d_apply, g_params, d_params, z)

            g_cost, g_grads = jax.value_and_grad(g_loss_fn)(state.g_params)
            g_updates, g_opt = opt.update(g_grads, state.g_opt, state.g_params)
            g_params = apply_updates(state.g_params, g_updates, lr_g)

            if self.g_ema_beta is not None:
                if state.g_ema is None:
                    raise ValueError(
                        "g_ema_beta is set but TrainState.g_ema is None — "
                        "initialize it (state._replace(g_ema=state.g_params))"
                        " before building steps")
                beta = self.g_ema_beta
                g_ema = jax.tree_util.tree_map(
                    lambda e, p: e + (1.0 - beta) * (p - e),
                    state.g_ema, g_params)
            else:
                g_ema = state.g_ema

            new_state = TrainState(g_params, d_params, g_opt, d_opt, rng,
                                   g_ema)
            # Reference reports the *last* D repeat's losses (trainer.py:89-97
            # overwrites d_losses each repeat).
            metrics = {
                "G_loss": g_cost,
                "D_loss": costs[-1],
                "D_real": drs[-1],
                "D_fake": dfs[-1],
            }
            return new_state, metrics

        return step

    def _build_step(self, depth: int, batch_size: int,
                    fade: bool = True) -> Callable:
        step = self._raw_step(depth, batch_size, fade)
        if self.mesh is not None:
            replicated, batch_shd = self._shardings()
            return jax.jit(
                step,
                donate_argnums=(0,),
                in_shardings=(replicated, batch_shd, None, None, None),
                out_shardings=(replicated, replicated),
            )
        return jax.jit(step, donate_argnums=(0,))

    def _build_group_step(self, depth: int, batch_size: int, fade: bool,
                          group: int) -> Callable:
        """``group`` consecutive train steps as ONE compiled program.

        The per-step host dispatch through the runtime costs a fixed
        ~5 ms/step wall on the attached tunnel (measured: the depth-0 step
        walls 5.3 ms with sub-ms device self-time) — at the 128px headline
        stage that is >10% of the step. Scanning the whole step over a
        leading group axis amortizes it ``group``-fold. Semantics are EXACT,
        not approximated: ``alpha``/``lr`` arrive as per-step vectors (the
        fade and LR ramp advance inside the group just as they would across
        separate dispatches), reals carry one batch per step, and metrics
        come back STACKED per step (shape (group,)) so the loss monitors'
        per-tick means cover every step, not a subsample.
        """
        raw = self._raw_step(depth, batch_size, fade)
        # scan-unroll knob (PGGAN_GROUP_UNROLL=n, default 1 = rolled),
        # SETTLED by a same-session TPU A/B (scripts/ab_group_unroll.py,
        # BASELINE.md round 4): depth-5 b16 self-time lone 48.20 / rolled
        # 47.70 / unrolled 48.07 ms with a 0.02 ms drift band — XLA aliases
        # the donated TrainState through the while-loop carry, so the rolled
        # scan costs NOTHING and unrolling would only multiply compile time
        # ~group-fold. (Round 3's apparent 47.7-vs-40.8 gap was cross-session
        # chip-clock drift, not carry copies.) Same numerics either way
        # (tests/test_group_step.py passes under PGGAN_GROUP_UNROLL=8).
        import os
        unroll = int(os.environ.get("PGGAN_GROUP_UNROLL", "1"))

        def gstep(state: TrainState, reals: jax.Array, alphas: jax.Array,
                  lrs_d: jax.Array, lrs_g: jax.Array):
            def body(st, xs):
                r, a, ld, lg = xs
                return raw(st, r, a, ld, lg)

            return jax.lax.scan(body, state, (reals, alphas, lrs_d, lrs_g),
                                unroll=min(unroll, group))

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            replicated = NamedSharding(self.mesh, P())
            batch_shd = NamedSharding(self.mesh,
                                      P(None, None, self.batch_axis))
            return jax.jit(
                gstep,
                donate_argnums=(0,),
                in_shardings=(replicated, batch_shd, None, None, None),
                out_shardings=(replicated, replicated),
            )
        return jax.jit(gstep, donate_argnums=(0,))

    def step_fn(self, depth: int, batch_size: int,
                fade: bool = True) -> Callable:
        """Jitted step for (depth, batch, fade). ``fade=False`` compiles
        the stable-phase graph with the blend paths statically removed (they
        multiply by zero at alpha==1 but still cost full-resolution HBM
        traffic — ~10% of the 1024px step in profiles)."""
        key = (depth, batch_size, fade)
        if key not in self._step_cache:
            self._step_cache[key] = self._build_step(depth, batch_size, fade)
        return self._step_cache[key]

    def group_step_fn(self, depth: int, batch_size: int, fade: bool,
                      group: int) -> Callable:
        """Jitted ``group``-step program for (depth, batch, fade): signature
        (state, reals (G,R,B,H,W,C), alphas (G,), lrs_d (G,), lrs_g (G,))
        -> (state, metrics stacked over the group). Callers wanting one
        step per dispatch use ``step_fn`` (no scan wrapper) instead."""
        key = (depth, batch_size, fade, group)
        if key not in self._step_cache:
            self._step_cache[key] = self._build_group_step(
                depth, batch_size, fade, group)
        return self._step_cache[key]

    def precompile(self, depth: int, batch_size: int, fade: bool,
                   state) -> None:
        """Warm the XLA compilation cache for a (depth, batch, fade) step
        without running it (AOT lower+compile on abstract shapes).

        Called from a background thread by DepthManager so the next growth
        stage's programs are ready before the schedule reaches them — stage
        transitions then stall on dispatch-cache population only, not on the
        multi-minute XLA compile of the 1024px grad-of-grad program.
        """
        import numpy as _np
        abstract_state = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(_np.shape(x), x.dtype), state)
        reals = jax.ShapeDtypeStruct(
            self.real_batch_shape(depth, batch_size), jnp.float32)
        scalar = jax.ShapeDtypeStruct((), jnp.float32)
        step = self.step_fn(depth, batch_size, fade)
        step.lower(abstract_state, reals, scalar, scalar, scalar).compile()

    def real_batch_shape(self, depth: int, batch_size: int) -> tuple:
        """Expected NHWC shape of the stacked real input:
        (d_training_repeats, B, H, W, C)."""
        res = self.G.resolution_at(depth)
        return (self.d_training_repeats, batch_size, res, res,
                self.G.num_channels)

    # -- device-side input prep --------------------------------------------
    def prep_fn(self, range_in=(0, 255), range_out=(-1, 1)):
        """jitted (u8_batch (R,B,H,W,C), alpha) -> f32 batch: cast + alpha
        fade (2x2 box blend, reference dataset.py:109-113) + dynamic-range
        remap, all on device.

        Lets the host ship raw uint8 pixels — 4x less host->device traffic
        than f32 — with XLA fusing the whole prep into one kernel. Exactly
        the loader's host-side prep semantics (data/native.py)."""
        key = ("prep", tuple(range_in), tuple(range_out))
        if key not in self._sample_cache:
            min_in, max_in = range_in
            min_out, max_out = range_out
            scale = (max_out - min_out) / (max_in - min_in)

            @jax.jit
            def prep(u8, alpha):
                # leading dims are free-form: (R, B, ...) for one step,
                # (group, R, B, ...) for a grouped dispatch. ``alpha`` is a
                # scalar, or a per-step vector aligned with the LEADING dim
                # (a grouped fade window) — reshaped to broadcast from the
                # left, not numpy's default right-alignment.
                x = u8.astype(jnp.float32)
                *lead, h, w, c = x.shape
                blocks = (*lead, h // 2, 2, w // 2, 2, c)
                t = x.reshape(blocks).mean(axis=(-4, -2))
                t = jnp.broadcast_to(
                    jnp.expand_dims(t, axis=(-4, -2)), blocks).reshape(x.shape)
                alpha = jnp.asarray(alpha, jnp.float32)
                alpha = alpha.reshape(
                    alpha.shape + (1,) * (x.ndim - alpha.ndim))
                x = x * alpha + t * (1.0 - alpha)
                return (x - min_in) * scale + min_out

            self._sample_cache[key] = prep
        return self._sample_cache[key]

    # -- sampling -----------------------------------------------------------
    def sample_fn(self, depth: int) -> Callable:
        """jitted (g_params, z, alpha) -> NHWC images at ``depth``."""
        if depth not in self._sample_cache:
            G = self.G
            self._sample_cache[depth] = jax.jit(
                lambda p, z, a: G.apply(p, z, depth, a))
        return self._sample_cache[depth]

