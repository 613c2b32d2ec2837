"""Plugin suite for the tick/iteration runtime (reference plugins.py).

Every non-core concern — progressive-growing schedule, LR ramp, loss stats,
wall-clock stats, checkpoints, sample generation, metrics export, logging —
is a plugin with declared trigger intervals on the ``iteration | epoch | s |
end`` queues (reference trainer.py:40-45). "tick" == "epoch" for plugin
purposes (reference README.md:46).

TPU-specific departures:
- Loss monitors keep the *device* scalars and only transfer at tick
  boundaries (one host sync per tick instead of one per iteration — the
  reference forced a CUDA sync every iteration through ``.data[0]``,
  plugins.py:109-111).
- ``DepthManager`` additionally acts as the staged-recompilation driver: a
  depth change swaps the jitted step (new static shapes), the data iterator
  and the latent batch size (reference plugins.py:65-74).
- ``SaverPlugin`` checkpoints the FULL train state (params + both Adam
  moments + PRNG key), fixing the reference's resume gap (SURVEY.md §5).
"""

from __future__ import annotations

import os
import time
from datetime import timedelta
from glob import glob

import numpy as np

from pggan_tpu.training import schedule
from pggan_tpu.training.schedule import lod_value, lr_rampup


class Plugin:
    """Base plugin: ``trigger_interval`` is a list of (interval, queue_name)."""

    def __init__(self, interval=None):
        self.trigger_interval = interval if interval is not None else []
        self.trainer = None

    def register(self, trainer):
        self.trainer = trainer


class DepthManager(Plugin):
    """The progressive-growing scheduler (reference plugins.py:13-81).

    Every iteration, re-derives (depth, alpha) purely from ``cur_nimg``
    (see ``schedule.depth_alpha_schedule``). On a depth change it mutates the
    trainer's stage: model depth, the per-depth minibatch (reference defaults
    {6:14, 7:6, 8:3}), a fresh data iterator at the new resolution, the
    latent generator, and the per-depth tick length. In this framework that
    depth change is also the staged-recompilation boundary: the Trainer picks
    the jitted step for (depth, minibatch) on the next iteration.
    """

    def __init__(self,
                 create_dataiter_fun=None,
                 create_rlg=None,
                 max_depth=None,
                 minibatch_default=schedule.MINIBATCH_DEFAULT,
                 minibatch_overrides=schedule.MINIBATCH_OVERRIDES,
                 tick_kimg_default=schedule.TICK_KIMG_DEFAULT,
                 tick_kimg_overrides=schedule.TICK_KIMG_OVERRIDES,
                 lod_training_nimg=schedule.LOD_TRAINING_NIMG,
                 lod_transition_nimg=schedule.LOD_TRANSITION_NIMG,
                 max_lod=None,
                 depth_offset=None,
                 precompile_ahead=False,
                 lr_reference_minibatch=None):
        super().__init__([(1, "iteration")])
        # When the pod batch policy rounded the per-depth batches up
        # (parallel/mesh.py fit_minibatch_to_mesh) and the user opted into
        # --scale_lr_with_batch, this holds the pre-policy reference batches
        # {"default": int, "overrides": {depth: int}}; the stage change then
        # sets trainer.lr_scale = actual/reference, consumed by LRScheduler.
        self.lr_reference_minibatch = lr_reference_minibatch
        # Background AOT warmup of the upcoming stage's programs. Off by
        # default: it overlaps compiles with training on hosts where XLA
        # compiles locally (multi-threaded), but on serialized remote-compile
        # setups the background compile DELAYS the foreground one (measured
        # 4x slower first tick through the axon tunnel).
        self.precompile_ahead = precompile_ahead
        self.create_dataiter_fun = create_dataiter_fun
        self.create_rlg = create_rlg
        self.max_depth = max_depth
        self.minibatch_default = minibatch_default
        self.minibatch_overrides = dict(minibatch_overrides or {})
        self.tick_kimg_default = tick_kimg_default
        self.tick_kimg_overrides = dict(tick_kimg_overrides or {})
        self.lod_training_nimg = lod_training_nimg
        self.lod_transition_nimg = lod_transition_nimg
        self.max_lod = max_lod
        self.depth_offset = depth_offset
        self.depth = -1
        self.alpha = -1.0

    def register(self, trainer):
        self.trainer = trainer
        # pure lookahead for the Trainer's grouped dispatch: how long the
        # (depth, alpha) law stays constant from a given nimg
        trainer.schedule_horizon = lambda nimg: schedule.stable_nimg_horizon(
            nimg, self.max_depth,
            self.lod_training_nimg, self.lod_transition_nimg)
        # fade-window duals: how long the current fade keeps alpha < 1 at
        # constant depth, and the exact per-nimg (depth, alpha) law — lets
        # the Trainer group fade steps with per-step alpha vectors
        trainer.fade_horizon = lambda nimg: schedule.fade_nimg_horizon(
            nimg, self.max_depth,
            self.lod_training_nimg, self.lod_transition_nimg)
        trainer.alpha_lookahead = lambda nimg: schedule.depth_alpha_schedule(
            nimg, self.max_depth,
            self.lod_training_nimg, self.lod_transition_nimg)
        if self.lod_transition_nimg > self.lod_training_nimg:
            # the nimg->(depth, alpha) divmod law (inherited from the
            # reference, plugins.py:57-63) mis-schedules in this regime:
            # depth can skip stages and alpha restarts at wrong offsets
            print("[DepthManager] WARNING: lod_transition_nimg > "
                  "lod_training_nimg is not supported by the schedule "
                  "arithmetic; stages will be skipped", flush=True)
        trainer.stats["minibatch_size"] = self.minibatch_default
        trainer.stats["alpha"] = {"log_name": "alpha",
                                  "log_epoch_fields": ["{val:.2f}"],
                                  "val": self.alpha}
        if self.max_lod is not None and self.depth_offset is not None:
            trainer.stats["lod"] = {"log_name": "lod",
                                    "log_epoch_fields": ["{val:.2f}"],
                                    "val": self.lod}
        self.iteration()

    @property
    def lod(self):
        return lod_value(self.depth, self.alpha, self.max_lod, self.depth_offset)

    def _precompile_upcoming(self, depth, minibatch_size):
        """Warm the compile cache in the background for the programs this
        stage will need next: the current depth's stable graph (used when
        alpha reaches 1) and the next depth's fade graph."""
        import threading
        trainer = self.trainer
        builder = getattr(trainer, "builder", None)
        if builder is None or not hasattr(builder, "precompile"):
            return
        targets = [(depth, minibatch_size, False)]
        if depth < self.max_depth:
            next_mb = self.minibatch_overrides.get(depth + 1,
                                                   self.minibatch_default)
            targets.append((depth + 1, next_mb, True))

        def work(state):
            for d, mb, fade in targets:
                try:
                    builder.precompile(d, mb, fade, state)
                except Exception as e:  # best-effort warmup only
                    print(f"[DepthManager] precompile({d},{mb},fade={fade}) "
                          f"failed: {e}", flush=True)

        threading.Thread(target=work, args=(trainer.state,), daemon=True,
                         name=f"pggan-precompile-d{depth}").start()

    def iteration(self, *args):
        from pggan_tpu.training.schedule import depth_alpha_schedule
        trainer = self.trainer
        depth, alpha = depth_alpha_schedule(
            trainer.cur_nimg, self.max_depth,
            self.lod_training_nimg, self.lod_transition_nimg)
        if depth != self.depth:
            self.depth = depth
            trainer.depth = depth
            if trainer.dataset is not None:
                trainer.dataset.model_depth = depth
                # apply the new alpha BEFORE spawning the stage's prefetch
                # workers — otherwise their first batches are built with the
                # previous stage's alpha (a smaller version of the reference's
                # frozen-fork-alpha defect, see datasets.py)
                trainer.dataset.alpha = alpha
            minibatch_size = self.minibatch_overrides.get(
                depth, self.minibatch_default)
            trainer.minibatch_size = minibatch_size
            if self.create_dataiter_fun is not None:
                old_iter = trainer.dataiter
                trainer.dataiter = iter(self.create_dataiter_fun(minibatch_size))
                if hasattr(old_iter, "close"):
                    old_iter.close()  # free the previous stage's prefetch workers
            if self.create_rlg is not None:
                trainer.random_latents_generator = self.create_rlg(minibatch_size)
            tick_kimg = self.tick_kimg_overrides.get(depth, self.tick_kimg_default)
            trainer.tick_duration_nimg = tick_kimg * 1000
            trainer.stats["minibatch_size"] = minibatch_size
            if self.lr_reference_minibatch is not None:
                ref = self.lr_reference_minibatch
                ref_mb = ref["overrides"].get(depth, ref["default"])
                trainer.lr_scale = minibatch_size / ref_mb
            if self.precompile_ahead:
                self._precompile_upcoming(depth, minibatch_size)
        if alpha != self.alpha:
            self.alpha = alpha
            trainer.alpha = alpha
            if trainer.dataset is not None:
                trainer.dataset.alpha = alpha
        trainer.stats["depth"] = depth
        trainer.stats["alpha"]["val"] = alpha
        if self.max_lod is not None and self.depth_offset is not None:
            trainer.stats["lod"]["val"] = self.lod


class LRScheduler(Plugin):
    """nimg-driven LR ramp for both optimizers (reference plugins.py:84-99 +
    train.py:151-158): lr = lr_max * exp(-5 p^2) during the first
    ``rampup_kimg`` kimg. Updates traced scalars — never recompiles."""

    def __init__(self, lr_max_d=0.001, lr_max_g=0.001, rampup_kimg=40.0):
        super().__init__([(1, "iteration")])
        self.lr_max_d = lr_max_d
        self.lr_max_g = lr_max_g
        self.rampup_kimg = rampup_kimg

    def register(self, trainer):
        self.trainer = trainer
        # pure lookahead for the Trainer's grouped dispatch: the lr this
        # plugin WOULD set at a given nimg (lr_scale only changes at depth
        # boundaries, which grouped windows never cross)
        trainer.lr_lookahead = self._lr_at
        self.iteration()

    def _lr_at(self, nimg):
        ramp = lr_rampup(nimg, self.rampup_kimg)
        # lr_scale: linear batch scaling set by DepthManager when the pod
        # batch policy grew a stage's global batch (opt-in, default 1.0)
        scale = getattr(self.trainer, "lr_scale", 1.0)
        return self.lr_max_d * ramp * scale, self.lr_max_g * ramp * scale

    def iteration(self, *args):
        self.trainer.lr_d, self.trainer.lr_g = self._lr_at(
            self.trainer.cur_nimg)


class EfficientLossMonitor(Plugin):
    """Accumulates one loss stream and exposes its per-tick mean as
    ``stats[name]['epoch_mean']`` (reference plugins.py:102-111).

    Values stay on device between ticks; the transfer happens once per tick.
    """

    def __init__(self, loss_no: int, stat_name: str):
        super().__init__([(1, "iteration"), (1, "epoch")])
        self.loss_no = loss_no
        self.stat_name = stat_name
        self._values = []

    def register(self, trainer):
        self.trainer = trainer
        trainer.stats[self.stat_name] = {
            "log_name": self.stat_name,
            "log_epoch_fields": ["{epoch_mean:.4f}"],
            "epoch_mean": float("nan"),
        }

    def iteration(self, idx, *losses):
        self._values.append(losses[self.loss_no])

    def epoch(self, epoch_idx):
        import jax
        if self._values:
            # entries are scalars (per-step dispatch) or (group,) vectors
            # (grouped dispatch) — every step's loss counts exactly once
            vals = np.concatenate([
                np.atleast_1d(np.asarray(v, dtype=np.float64))
                for v in jax.device_get(self._values)])
            self.trainer.stats[self.stat_name]["epoch_mean"] = float(vals.mean())
            self._values = []


class AbsoluteTimeMonitor(Plugin):
    """Wall-clock stats per tick: total time, sec/tick, sec/kimg (reference
    plugins.py:114-139). ``sec.kimg`` is the framework's throughput metric."""

    def __init__(self, base_time=0.0):
        super().__init__([(1, "epoch")])
        self.base_time = base_time
        self.start_time = time.time()
        self.epoch_start = self.start_time
        self.start_nimg = None

    def register(self, trainer):
        self.trainer = trainer
        self.start_nimg = trainer.cur_nimg
        trainer.stats["sec"] = {"log_format": ":.1f"}

    def epoch(self, epoch_index):
        cur_time = time.time()
        tick_time = cur_time - self.epoch_start
        self.epoch_start = cur_time
        nimg_done = max(self.trainer.cur_nimg - self.start_nimg, 1)
        kimg_time = tick_time / nimg_done * 1000
        self.start_nimg = self.trainer.cur_nimg
        self.trainer.stats["time"] = timedelta(
            seconds=cur_time - self.start_time + self.base_time)
        self.trainer.stats["sec"]["tick"] = tick_time
        self.trainer.stats["sec"]["kimg"] = kimg_time


class SaverPlugin(Plugin):
    """Checkpointing (reference plugins.py:142-174), extended to full state.

    Writes, every ``network_snapshot_ticks`` ticks and at end:
    - ``network-snapshot-generator-{kimg:06}.dat`` / ``...-discriminator-...``
      — self-contained model snapshots (config + params) loadable by the
      ``generate`` CLI, mirroring the reference's file layout;
    - ``training-state-{kimg:06}.dat`` — the full TrainState (both Adam
      states, PRNG key, nimg/tick clocks) for exact resume, fixing the
      reference's optimizer/RNG checkpoint gap (SURVEY.md §5).
    Older snapshots are removed unless ``keep_old_checkpoints``.
    """

    last_pattern = "network-snapshot-{}-{}.dat"
    state_pattern = "training-state-{}.dat"

    def __init__(self, checkpoints_path, keep_old_checkpoints=False,
                 network_snapshot_ticks=40):
        super().__init__([(network_snapshot_ticks, "epoch"), (1, "end")])
        self.checkpoints_path = checkpoints_path
        self.keep_old_checkpoints = keep_old_checkpoints

    def epoch(self, epoch_index):
        from pggan_tpu.checkpoint import save_snapshot, save_training_state
        kimg = "{:06}".format(self.trainer.cur_nimg // 1000)
        trainer = self.trainer
        # Write the new snapshots FIRST, then delete older ones: a crash
        # mid-save must never leave the directory without a valid resume
        # point. (Both writes are atomic: temp file + rename, checkpoint.py.)
        written = []
        targets = [("generator", trainer.G, trainer.state.g_params),
                   ("discriminator", trainer.D, trainer.state.d_params)]
        if getattr(trainer.state, "g_ema", None) is not None:
            # smoothed generator (--g_ema_beta): the snapshot generate/eval
            # should usually consume. Self-contained like the others.
            targets.append(("generator-ema", trainer.G, trainer.state.g_ema))
        for name, model, params in targets:
            path = os.path.join(self.checkpoints_path,
                                self.last_pattern.format(name, kimg))
            save_snapshot(path, model, params, trainer.depth, trainer.alpha)
            written.append(path)
        state_path = os.path.join(self.checkpoints_path,
                                  self.state_pattern.format(kimg))
        # cumulative training wall-clock (the "time" stat is kept current by
        # AbsoluteTimeMonitor, registered ahead of the saver): restored into
        # AbsoluteTimeMonitor(base_time) on resume for a continuous clock
        t = trainer.stats.get("time")
        base_time = t.total_seconds() if hasattr(t, "total_seconds") else 0.0
        save_training_state(
            state_path, trainer.state, trainer.cur_nimg, trainer.iterations,
            base_time)
        written.append(state_path)
        if not self.keep_old_checkpoints:
            self._clear(self.last_pattern.format("*", "*"), keep=written)
            self._clear(self.state_pattern.format("*"), keep=written)

    def end(self, *args):
        self.epoch(*args)

    def _clear(self, pattern, keep=()):
        keep = {os.path.abspath(p) for p in keep}
        for file_name in glob(os.path.join(self.checkpoints_path, pattern)):
            if os.path.abspath(file_name) not in keep:
                os.remove(file_name)


class OutputGenerator(Plugin):
    """Periodic sample generation (reference plugins.py:177-195): draw
    ``samples_count`` latents, run the generator at the current (depth,
    alpha), hand NCHW numpy output to every postprocessor with
    ``cur_nimg // 1000`` as the description."""

    def __init__(self, sample_fn, output_postprocessors, samples_count=6,
                 output_snapshot_ticks=3, use_ema=True):
        super().__init__([(output_snapshot_ticks, "epoch"), (1, "end")])
        self.sample_fn = sample_fn
        self.output_postprocessors = output_postprocessors
        self.samples_count = samples_count
        # sample from the smoothed generator when --g_ema_beta keeps one
        # (Karras samples from Gs, not the live G); --OutputGenerator.use_ema
        # False forces live-G samples for debugging
        self.use_ema = use_ema

    def epoch(self, epoch_index):
        trainer = self.trainer
        z = np.asarray(self.sample_fn(self.samples_count), dtype=np.float32)
        apply_fn = trainer.builder.sample_fn(trainer.depth)
        g_ema = getattr(trainer.state, "g_ema", None)
        params = g_ema if (self.use_ema and g_ema is not None) \
            else trainer.state.g_params
        out = apply_fn(params, z, trainer.alpha)
        out_nchw = np.asarray(out).transpose(0, 3, 1, 2)  # NHWC -> NCHW
        for proc in self.output_postprocessors:
            try:
                proc(out_nchw, trainer.cur_nimg // 1000)
            except Exception:
                # a broken exporter must not kill a multi-day run
                import traceback
                print(f"[OutputGenerator] postprocessor {proc} failed:",
                      flush=True)
                traceback.print_exc()

    def end(self, *args):
        self.epoch(*args)


class MetricsExporter(Plugin):
    """Structured per-tick metrics export (the reference's CometML plugin
    role, plugins.py:198-216, without the external service): appends one JSON
    object per tick with the selected dotted stat paths to ``metrics.jsonl``.
    If a CometML experiment object is passed, it is also fed (duck-typed
    ``log_metric``/``log_epoch_end``)."""

    def __init__(self, fields, jsonl_path=None, experiment=None):
        super().__init__([(1, "epoch")])
        self.fields = fields
        self.jsonl_path = jsonl_path
        self.experiment = experiment

    def _resolve(self, field):
        parts = field.split(".")
        stat = self.trainer.stats.get(parts[0])
        for p in parts[1:]:
            if not isinstance(stat, dict):
                return None
            stat = stat.get(p)
        if isinstance(stat, dict):
            stat = stat.get("epoch_mean", stat.get("val"))
        return stat

    def epoch(self, epoch_index):
        import json
        record = {"tick": epoch_index}
        for field in self.fields:
            val = self._resolve(field)
            if hasattr(val, "total_seconds"):
                val = val.total_seconds()
            record[field] = (float(val) if isinstance(val, (int, float, np.floating))
                             else val)
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps(record) + "\n")
        if self.experiment is not None:
            for field, val in record.items():
                if field != "tick":
                    self.experiment.log_metric(field, val)
            self.experiment.log_epoch_end(epoch_index)


# Backwards-compatible alias mirroring the reference plugin name.
CometPlugin = MetricsExporter


class TraceProfiler(Plugin):
    """On-demand device trace capture (the tracing subsystem the reference
    lacks, SURVEY.md §5): records a ``jax.profiler`` trace of
    ``num_iterations`` steady-state iterations into ``profile_dir`` (viewable
    with TensorBoard / xprof). Starts after ``start_iteration`` so compile
    time is excluded.

    Under grouped dispatch (Trainer.steps_per_dispatch > 1, the default)
    the iteration index advances by the group size per drain, so the
    trace window rounds outward to group boundaries: it starts at the
    first drain at/after ``start_iteration`` and covers at least
    ``num_iterations`` iterations — whole grouped programs, typically
    ``ceil(num_iterations / group)`` of them. Set
    ``--Trainer.steps_per_dispatch 1`` to trace exact single-step windows.
    """

    def __init__(self, profile_dir, start_iteration=20, num_iterations=5):
        super().__init__([(1, "iteration")])
        self.profile_dir = profile_dir
        self.start_iteration = start_iteration
        self.stop_iteration = start_iteration + num_iterations
        self._active = False
        self._done = False

    def iteration(self, idx, *args):
        import jax
        if self._done:
            return
        if not self._active and idx >= self.start_iteration:
            jax.profiler.start_trace(self.profile_dir)
            self._active = True
        elif self._active and idx >= self.stop_iteration:
            jax.block_until_ready(self.trainer.state.g_params)
            jax.profiler.stop_trace()
            self._active = False
            self._done = True
            print(f"[TraceProfiler] trace written to {self.profile_dir}",
                  flush=True)


class Logger(Plugin):
    """Tick-line logger over the stats registry (the torch Logger role the
    reference subclasses at plugins.py:219-231).

    Renders, for each configured field, either the stat dict's
    ``log_epoch_fields`` templates (formatted with the dict itself) or the
    plain value; dotted fields index into nested stat dicts and use the
    parent's ``log_format`` when present.
    """

    def __init__(self, fields, interval=None):
        super().__init__(interval if interval is not None else [(1, "epoch")])
        self.fields = fields

    def _render_field(self, field):
        parts = field.split(".")
        stats = self.trainer.stats
        stat = stats.get(parts[0])
        if stat is None:
            return None
        if len(parts) > 1:
            fmt = stat.get("log_format", "") if isinstance(stat, dict) else ""
            for p in parts[1:]:
                if not isinstance(stat, dict) or p not in stat:
                    return None
                stat = stat[p]
            name = field
            val = ("{" + fmt + "}").format(stat) if fmt else str(stat)
            return f"{name} {val}"
        if isinstance(stat, dict):
            name = stat.get("log_name", field)
            fields = stat.get("log_epoch_fields")
            if fields:
                try:
                    vals = " ".join(t.format(**stat) for t in fields)
                except (KeyError, ValueError):
                    vals = "?"
                return f"{name} {vals}"
            return f"{name} {stat}"
        return f"{field} {stat}"

    def epoch(self, epoch_idx):
        rendered = [self._render_field(f) for f in self.fields]
        self.log("  ".join(r for r in rendered if r is not None))

    def end(self, *args):
        pass

    def log(self, msg):
        print(msg, flush=True)


class TeeLogger(Logger):
    """Console + ``log.txt`` tee (reference plugins.py:219-231)."""

    def __init__(self, log_file, fields, interval=None):
        super().__init__(fields, interval)
        self.log_file = open(log_file, "a", 1)

    def log(self, msg):
        print(msg, flush=True)
        self.log_file.write(msg + "\n")
