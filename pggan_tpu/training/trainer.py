"""Host-side training engine: the hot loop + the heap-based plugin scheduler
(reference trainer.py).

The reference engine drove 4 eager D/G passes per iteration with per-call
host<->device transfers (trainer.py:85-115). Here one iteration is a single
dispatch of the fused jitted step (see ``steps.py``): the host only feeds the
next real batch, advances the nimg clock, and runs due plugins. Loss scalars
returned by the step stay on device until tick boundaries (the loss monitors
fetch them lazily), so iterations pipeline: the host can enqueue step k+1
while the device still executes step k.

Plugin queue semantics preserved exactly (trainer.py:40-69): four queues
``iteration | epoch | s | end``, a heap ordered by next-due time; a due
plugin's method named after the queue is invoked and the plugin re-scheduled
at ``time + interval``.
"""

from __future__ import annotations

import collections
import heapq

import numpy as np


class Trainer:
    """Progressive-GAN training engine.

    Parameters mirror the reference Trainer (trainer.py:7-19) where they make
    sense for the functional design: models + a ``TrainStepBuilder`` replace
    the (D, G, loss, optimizer) quadruple since those are fused in the step.

    Mutable attributes that plugins reach into (the reference's contract,
    SURVEY.md §1 L3): ``cur_nimg``, ``dataiter``, ``random_latents_generator``,
    ``tick_duration_nimg``, ``stats``, ``depth``, ``alpha``,
    ``minibatch_size``, ``lr_d``, ``lr_g``, ``state``.
    """

    def __init__(self,
                 G,
                 D,
                 builder,
                 state,
                 dataset,
                 dataiter,
                 random_latents_generator,
                 D_training_repeats=1,
                 tick_nimg_default=2 * 1000,
                 resume_nimg=0,
                 resume_iterations=0,
                 steps_per_dispatch=8,
                 inflight_budget_mb=1024):
        self.G = G
        self.D = D
        self.builder = builder
        # Grouped dispatch: up to this many consecutive steps are scanned
        # into ONE compiled program (steps.py group_step_fn) whenever the
        # schedule is provably constant over the window — amortizes the
        # fixed per-dispatch host/runtime cost. 1 disables grouping.
        self.steps_per_dispatch = int(steps_per_dispatch)
        # Dispatch backpressure: JAX enqueues asynchronously and the loss
        # monitors only force completion at tick end, so on a lagging
        # (contended / remote-attached) device the host can run a whole
        # tick ahead — every in-flight dispatch pins its input batch plus
        # the transfer copies in host RAM until the runtime completes it.
        # Once the shipped input bytes of unfinished dispatches exceed this
        # budget, the oldest dispatch is forced to completion with a true
        # host fetch (``block_until_ready`` is a no-op on remote-backend
        # arrays). Bytes, not dispatch count: small early-depth batches
        # never throttle, only the stages whose batches are actually big
        # enough to matter. 0 disables.
        #
        # Scope (measured, BASELINE.md round-5 "H5 windowed leg"): this
        # bounds memory that is pinned BY PENDING DISPATCHES — the PJRT
        # contract frees input staging on completion. The axon tunnel
        # client in this environment additionally leaks EVERY transferred
        # input literal unconditionally (+batch_bytes per dispatch,
        # surviving completion, gc, and ``Array.delete()``;
        # scripts/probe_literal_rss.py pins it — CPU backend flat, axon
        # linear even for repeated identical literals), which no amount of
        # throttling can reclaim; there, ship less (``device_input_prep``
        # uint8 batches are 4x smaller).
        self.inflight_budget_mb = int(inflight_budget_mb)
        self._inflight = collections.deque()  # (metric_handle, input_bytes)
        self._inflight_bytes = 0
        # Pure lookahead hooks the schedule plugins install at registration:
        # ``schedule_horizon(nimg) -> float`` (images until (depth, alpha)
        # next changes; DepthManager) and ``lr_lookahead(nimg) ->
        # (lr_d, lr_g)`` (LRScheduler). Grouping stays off until a horizon
        # is known — a custom plugin mutating the stage mid-window would
        # otherwise be skipped silently.
        self.schedule_horizon = None
        self.lr_lookahead = None
        # fade-window duals (DepthManager): ``fade_horizon(nimg)`` — images
        # until the running fade's alpha hits 1.0 — and ``alpha_lookahead
        # (nimg) -> (depth, alpha)``; enable grouped dispatch INSIDE fades
        # with exact per-step alpha vectors.
        self.fade_horizon = None
        self.alpha_lookahead = None
        self.total_nimg = None
        self.state = state
        self.dataset = dataset
        self.dataiter = dataiter
        self.random_latents_generator = random_latents_generator
        self.D_training_repeats = D_training_repeats
        self.cur_nimg = resume_nimg
        self.tick_start_nimg = self.cur_nimg
        self.tick_duration_nimg = tick_nimg_default
        self.iterations = resume_iterations
        self.cur_tick = 0
        self.depth = 0
        self.alpha = 1.0
        self.minibatch_size = None
        self.lr_d = 0.0
        self.lr_g = 0.0
        self.lr_scale = 1.0  # pod batch policy's opt-in LR scaling
        self.stats = {}
        self._register_stat("kimg_stat", self.cur_nimg / 1000.0,
                            "{val:8.3f}", "kimg")
        self._register_stat("tick_stat", self.cur_tick, "{val:5}", "tick")
        self.plugin_queues = {q: [] for q in ("iteration", "epoch", "s", "end")}

    def _register_stat(self, key, val, fmt, name):
        self.stats[key] = {"val": val, "log_epoch_fields": [fmt],
                           "log_name": name}

    # -- plugin scheduler -----------------------------------------------------
    # Queue semantics are the reference contract (trainer.py:40-69): a plugin
    # declares ``trigger_interval`` entries ``(interval, unit)`` with unit one
    # of iteration|epoch|s|end; each unit's queue is a min-heap keyed by the
    # next due time, and when a queue is drained at time T every due plugin's
    # method named after the unit is called and rescheduled at T + interval.
    # Unlike the reference, the interval travels IN the heap entry — looking
    # it up from ``plugin.trigger_interval`` at drain time breaks for plugins
    # registered on several queues or declaring a bare (interval, unit) tuple.

    def register_plugin(self, plugin):
        plugin.register(self)
        triggers = plugin.trigger_interval
        if not isinstance(triggers, list):
            triggers = [triggers]
        for interval, unit in triggers:
            queue = self.plugin_queues[unit]
            # serial = registration order: deterministic tie-break, and keeps
            # plugin objects (unorderable) out of the heap comparison
            heapq.heappush(queue, (interval, len(queue), interval, plugin))

    def call_plugins(self, queue_name, time, *args):
        queue = self.plugin_queues[queue_name]
        while queue and queue[0][0] <= time:
            _, serial, interval, plugin = heapq.heappop(queue)
            getattr(plugin, queue_name)(time, *args)
            heapq.heappush(queue, (time + interval, serial, interval, plugin))

    # -- run loop (reference trainer.py:71-83 semantics) ---------------------
    def run(self, total_kimg=1):
        import time as _time
        total_nimg = total_kimg * 1000
        self.total_nimg = total_nimg
        # the 's' queue is drained on wall-clock seconds since run() started
        # (a plugin method named 's' fires every `interval` seconds, checked
        # between iterations). The reference DECLARES this queue but never
        # services it (its trainer.py:40-45 vs run loop 71-83) — a plugin
        # registering on 's' there silently never fires; here it works.
        run_start = _time.time()
        while self.cur_nimg < total_nimg:
            self.train()
            if self.plugin_queues["s"]:
                self.call_plugins("s", _time.time() - run_start)
            if (self.cur_nimg >= self.tick_start_nimg + self.tick_duration_nimg
                    or self.cur_nimg >= total_nimg):
                self._rollover_tick()
        self.call_plugins("end", 1)

    def _rollover_tick(self):
        self.cur_tick += 1
        self.tick_start_nimg = self.cur_nimg
        self.stats["kimg_stat"]["val"] = self.cur_nimg / 1000.0
        self.stats["tick_stat"]["val"] = self.cur_tick
        self.call_plugins("epoch", self.cur_tick)

    # -- grouped dispatch ----------------------------------------------------
    def _plan_group(self):
        """Plan the next dispatch: ``(group, alphas)`` — how many steps it
        may fuse (steps.py group_step_fn) and, for a grouped fade window,
        the validated per-step alpha vector (None otherwise). group > 1
        only when provably exact: either a schedule-stable window
        (``schedule_horizon`` covers the whole group) or a window fully
        inside one fade (``fade_horizon`` — alpha then advances per step
        through the grouped program's alpha vector, exactly as the per-step
        path would have set it); never crossing a tick or run boundary any
        further than a single step would, and always exactly
        ``steps_per_dispatch`` steps — smaller groups near boundaries fall
        back to per-step dispatch so only TWO grouped programs (stable +
        fade) are ever compiled per (depth, batch) instead of one per
        residual length.
        """
        spd = self.steps_per_dispatch
        if (spd <= 1 or self.schedule_horizon is None
                or self.minibatch_size is None):
            return 1, None
        per = self.minibatch_size * self.D_training_repeats
        alphas = None
        if self.alpha < 1.0:
            # fade window: alpha advances per step INSIDE the group via the
            # per-step alpha vector; grouping is sound while the whole
            # window stays in this fade — the last step's alpha, taken at
            # nimg = start + (spd-1)*per, must still be < 1.0 so every step
            # uses the fade graph the per-step path would have used
            if self.fade_horizon is None or self.alpha_lookahead is None:
                return 1, None
            if self.fade_horizon(self.cur_nimg) <= (spd - 1) * per:
                return 1, None
            # Cross-check of every step's law point: in the warned
            # lod_transition > lod_training regime the divmod schedule can
            # change depth INSIDE what fade_nimg_horizon promised was one
            # fade (DepthManager prints the warning at registration); the
            # per-step path runs that degenerate schedule, so fall back to
            # it rather than dispatch a grouped window that would desync.
            # Step k consumes the alpha the DepthManager would have set
            # after step k-1, i.e. the law at nimg = start + k*per —
            # exactly the per-step path's sequencing.
            pairs = [self.alpha_lookahead(self.cur_nimg + k * per)
                     for k in range(spd)]
            if any(d != self.depth or a >= 1.0 for d, a in pairs):
                return 1, None
            alphas = np.asarray([a for _, a in pairs], np.float32)
        elif self.schedule_horizon(self.cur_nimg) < spd * per:
            return 1, None
        remaining = self.tick_start_nimg + self.tick_duration_nimg - self.cur_nimg
        if self.total_nimg is not None:
            remaining = min(remaining, self.total_nimg - self.cur_nimg)
        if -(-remaining // per) < spd:  # ceil: steps fitting before boundary
            return 1, None
        return spd, alphas

    def _train_grouped(self, group, alphas):
        """``group`` iterations in ONE device dispatch. Exact per-step
        semantics: one real batch per step, the LR ramp advances through the
        per-step lr vectors (``lr_lookahead``), metrics return stacked
        (group,) so the loss monitors' tick means cover every step. The
        iteration plugin queue is drained once per dispatch at the final
        iteration count — the schedule plugins are nimg-pure so this is
        equivalent, and loss monitors consume the stacked vectors.

        ``alphas`` is the per-step alpha vector ``_plan_group`` validated
        for a fade window (it drives the model blend AND the uint8 device
        data blend), or None in a stable window (constant 1.0).

        Fade windows: model alphas are exact per step (vector); the DATA
        fade blend is exact per step on the uint8 device-prep path, while
        host-prepped float batches carry the loader's prefetch-time alpha —
        staleness grows from (prefetch_depth+1)*per to (prefetch_depth+
        group)*per images, a <0.2% alpha offset on the reference schedule
        (and strictly tighter than the reference's forked workers, which
        froze alpha for their whole lifetime — dataset.py:109-113)."""
        start_nimg = self.cur_nimg
        if alphas is None:
            alphas = np.full((group,), self.alpha, np.float32)

        reals, batch = self._fetch_reals(group, alphas)
        if batch != self.minibatch_size:
            raise RuntimeError(
                f"grouped dispatch planned for minibatch "
                f"{self.minibatch_size} but the data iterator served "
                f"{batch}; keep them in sync or set steps_per_dispatch=1")
        per = batch * self.D_training_repeats
        self.cur_nimg += group * per
        if self.lr_lookahead is not None:
            # step k consumes the lr the scheduler would have set after
            # step k-1, i.e. at nimg = start + k*per (matching the plugin
            # call order of the per-step path)
            pairs = [self.lr_lookahead(start_nimg + k * per)
                     for k in range(group)]
            lrs_d = np.asarray([p[0] for p in pairs], np.float32)
            lrs_g = np.asarray([p[1] for p in pairs], np.float32)
        else:
            lrs_d = np.full((group,), self.lr_d, np.float32)
            lrs_g = np.full((group,), self.lr_g, np.float32)

        gstep = self.builder.group_step_fn(self.depth, batch,
                                           self.alpha < 1.0, group)
        in_bytes = getattr(reals, "nbytes", 0)
        self.state, metrics = gstep(self.state, reals, alphas, lrs_d, lrs_g)
        self._throttle_inflight(metrics, in_bytes)
        self.iterations += group
        self.call_plugins("iteration", self.iterations,
                          metrics["G_loss"], metrics["D_loss"],
                          metrics["D_real"], metrics["D_fake"])

    def _throttle_inflight(self, metrics, input_bytes):
        """Dispatch backpressure (see ``inflight_budget_mb``): remember one
        small output handle per dispatch; once the input bytes shipped with
        unfinished dispatches exceed the budget, force the OLDEST dispatch
        to completion with a real host fetch. Fetching any output waits for
        its whole executable, so this bounds host-pinned transfer memory at
        ~budget while keeping the pipeline ``budget/batch_bytes`` dispatches
        deep (tens of steps at the high depths). The fetched values are the
        same arrays the loss monitors read at tick end — materializing them
        early has no semantic effect."""
        if not self.inflight_budget_mb:
            return
        self._inflight.append((metrics["D_loss"], int(input_bytes)))
        self._inflight_bytes += int(input_bytes)
        budget = self.inflight_budget_mb * (1024 * 1024)
        while self._inflight_bytes > budget and len(self._inflight) > 1:
            handle, nbytes = self._inflight.popleft()
            self._inflight_bytes -= nbytes
            np.asarray(handle)  # true round-trip even on remote backends

    def _fetch_reals(self, n_steps, alpha):
        """Assemble the real input for ``n_steps`` consecutive steps: fetch
        ``n_steps * D_training_repeats`` local batches, build the (global)
        tensor with leading dims ``(n_steps, repeats)`` — the single-step
        caller passes ``n_steps=1`` and gets the step's ``(repeats, B, ...)``
        directly — and run the dtype/device prep. Multi-host: each process
        feeds its local shard (batch/nimg accounting is global); uint8 raw
        pixels ship 4x smaller and the fade + dynamic-range prep runs on
        device fused by XLA, blended by ``alpha`` (a scalar, or one per step
        for a grouped fade window). Returns ``(reals, global_batch)``.

        This is THE data path for both dispatch modes — keep it single so a
        dtype/prep/sharding fix can never reach one mode and miss the other.
        """
        import jax
        repeats = self.D_training_repeats
        raw = [np.asarray(next(self.dataiter))
               for _ in range(n_steps * repeats)]
        local_batch = raw[0].shape[0]
        lead = (n_steps, repeats) if n_steps > 1 else (repeats,)
        reals = np.stack(raw, axis=0).reshape(lead + raw[0].shape)
        multihost = (self.builder.mesh is not None
                     and jax.process_count() > 1)
        batch = local_batch * (jax.process_count() if multihost else 1)
        if multihost:
            from pggan_tpu.parallel.mesh import make_global_batch
            reals = make_global_batch(reals, self.builder.mesh,
                                      self.builder.batch_axis,
                                      batch_dim=len(lead))
        if reals.dtype == np.uint8:
            ds = self.dataset
            prep = self.builder.prep_fn(
                ds.range_in if ds is not None else (0, 255),
                ds.range_out if ds is not None else (-1, 1))
            reals = prep(reals, alpha)
        elif reals.dtype != np.float32:
            reals = np.asarray(reals, np.float32) if isinstance(
                reals, np.ndarray) else reals.astype(np.float32)
        return reals, batch

    # -- hot loop (reference trainer.py:85-115, fused) ----------------------
    def train(self):
        group, alphas = self._plan_group()
        if group > 1:
            self._train_grouped(group, alphas)
            return
        reals, batch = self._fetch_reals(1, np.float32(self.alpha))
        self.cur_nimg += batch * self.D_training_repeats

        # Stable phase (alpha == 1) uses the blend-free graph — the fade
        # paths are statically removed instead of multiplying by zero.
        step = self.builder.step_fn(self.depth, batch,
                                    fade=self.alpha < 1.0)
        in_bytes = getattr(reals, "nbytes", 0)
        self.state, metrics = step(self.state, reals,
                                   np.float32(self.alpha),
                                   np.float32(self.lr_d),
                                   np.float32(self.lr_g))
        self._throttle_inflight(metrics, in_bytes)

        self.iterations += 1
        self.call_plugins("iteration", self.iterations,
                          metrics["G_loss"], metrics["D_loss"],
                          metrics["D_real"], metrics["D_fake"])
