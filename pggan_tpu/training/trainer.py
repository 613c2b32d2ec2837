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
                 resume_iterations=0):
        self.G = G
        self.D = D
        self.builder = builder
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
        total_nimg = total_kimg * 1000
        while self.cur_nimg < total_nimg:
            self.train()
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

    # -- hot loop (reference trainer.py:85-115, fused) ----------------------
    def train(self):
        import jax
        raw = [np.asarray(next(self.dataiter))
               for _ in range(self.D_training_repeats)]
        local_batch = raw[0].shape[0]
        reals = np.stack(raw, axis=0)
        # Multi-host: each host feeds its local shard; batch/nimg accounting
        # is global (local * process_count).
        multihost = (self.builder.mesh is not None
                     and jax.process_count() > 1)
        batch = local_batch * (jax.process_count() if multihost else 1)
        self.cur_nimg += batch * self.D_training_repeats

        if multihost:
            from pggan_tpu.parallel.mesh import make_global_batch
            reals = make_global_batch(reals, self.builder.mesh,
                                      self.builder.batch_axis, batch_dim=1)
        if reals.dtype == np.uint8:
            # raw pixels shipped to the device (4x smaller transfer);
            # fade + dynamic-range prep runs on device, fused by XLA
            ds = self.dataset
            prep = self.builder.prep_fn(
                ds.range_in if ds is not None else (0, 255),
                ds.range_out if ds is not None else (-1, 1))
            reals = prep(reals, np.float32(self.alpha))
        elif reals.dtype != np.float32:
            reals = np.asarray(reals, np.float32) if isinstance(
                reals, np.ndarray) else reals.astype(np.float32)

        # Stable phase (alpha == 1) uses the blend-free graph — the fade
        # paths are statically removed instead of multiplying by zero.
        step = self.builder.step_fn(self.depth, batch,
                                    fade=self.alpha < 1.0)
        self.state, metrics = step(self.state, reals,
                                   np.float32(self.alpha),
                                   np.float32(self.lr_d),
                                   np.float32(self.lr_g))

        self.iterations += 1
        self.call_plugins("iteration", self.iterations,
                          metrics["G_loss"], metrics["D_loss"],
                          metrics["D_real"], metrics["D_fake"])
