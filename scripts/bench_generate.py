#!/usr/bin/env python
"""Serving benchmark: generator-only sampling throughput per depth.

The training bench (bench.py) measures the fused G+D WGAN-GP step; this
measures the INFERENCE path a deployment serves — ``G.apply`` on a batch of
latents (the same jitted forward cli/generate.py and cli/eval.py dispatch;
reference counterpart: the Generator forward inside
/root/reference/plugins.py OutputGenerator and generate.py's sample loop).

Methodology (see BASELINE.md measurement rules, plus one wrinkle of its
own): the attached runtime ELIDES repeated identical dispatches — a
same-args ``fn(params, zs)`` loop with a block on the last output reads
~0.2 ms/dispatch at a depth where real compute is tens of ms, because the
un-consumed earlier results are never materialized, and re-dispatching
byte-identical args is answered from cache. bench.py is immune because
its train step chains the TrainState through every dispatch. This bench
restores the same property twice over: (1) the whole K-batch loop runs
INSIDE one compiled program (``lax.scan`` carrying a checksum that
consumes every image — sum of per-batch means — returning only the
scalar), and (2) the checksum chains ACROSS timing rounds (round N's
carry seeds round N+1's program args), so no two dispatches are
identical and each must execute. A further tunnel wrinkle:
``block_until_ready`` is a NO-OP on axon arrays (measured 0.1 ms for a
program whose host fetch takes 87 ms) — only fetching the value to host
synchronizes, so each round ends with ``float(acc)``. The one-scalar
fetch is the tunnel's fixed ~5 ms round-trip, amortized over the K
batches inside the program; the MIN over many rounds is the capability
estimator on the shared chip. Images are produced and reduced on device
— fetching them would measure the tunnel, not the framework.

Usage: scripts/bench_generate.py [--selftime] [--batch N] [--bf16] \
           [--chain] [DEPTH ...]
(default depths 0..8; default batch is the training-parity per-depth
minibatch — pass --batch to measure a serving batch instead: inference
holds no optimizer/GP state, so the tail depths serve far larger batches
than they train. --bf16 sets Generator.compute_dtype=bfloat16 — a pure
serving knob with none of training's GP second-order precision stakes.
--chain sets Generator.inference_chain: each tail block's conv pair runs
as ONE fused forward-only Pallas kernel, ops/pallas_chain.py)
"""

import sys
import time

import numpy as np

# serving batch per depth: the training bench's per-depth minibatch
# (reference plugins.py:19-20) so the two tables are comparable; inference
# has no optimizer/GP memory, so larger batches also fit — this is the
# conservative number.
MINIBATCH = {d: 16 for d in range(9)}
MINIBATCH.update({6: 14, 7: 6, 8: 3})

# scan length per depth: batches generated per dispatched program — long
# enough to swamp the per-dispatch tunnel cost at the fast depths, short
# enough to keep a 1024px round under a second
SCAN_LEN = {0: 256, 1: 256, 2: 256, 3: 128, 4: 64, 5: 32, 6: 16, 7: 16,
            8: 16}
ROUNDS = 8


def main():
    import jax
    import jax.numpy as jnp

    from pggan_tpu.models import Generator
    from pggan_tpu.utils.misc import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    args = sys.argv[1:]
    want_selftime = "--selftime" in args
    want_bf16 = "--bf16" in args
    want_chain = "--chain" in args  # fused conv-pair serving kernels
    if want_chain:
        args.remove("--chain")
    batch_override = None
    if "--batch" in args:
        i = args.index("--batch")
        try:
            batch_override = int(args[i + 1])
        except (IndexError, ValueError):
            raise SystemExit("usage: --batch N (an integer)")
        del args[i:i + 2]
    only = [int(a) for a in args if a.isdigit()]
    depths = only or list(range(9))

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    shape = (1, 3, 1024, 1024)  # paper config, same as bench.py
    G = Generator(shape,
                  compute_dtype="bfloat16" if want_bf16 else "float32",
                  inference_chain=want_chain)
    params = G.init(jax.random.PRNGKey(0))
    alpha = np.float32(1.0)

    for depth in depths:
        batch = batch_override or MINIBATCH[depth]
        res = 4 << depth
        K = SCAN_LEN[depth]

        def sample_many(params, zs, seed, depth=depth):
            # zs: (K, B, latent). The checksum carry consumes every image,
            # so no forward can be elided or dead-code-removed; only the
            # scalar leaves the device. `seed` is the previous round's
            # checksum: it perturbs the latents, so every round's dispatch
            # is a distinct computation the runtime must actually execute.
            def body(acc, z):
                # stable snapshots serve the fade-free graph (what
                # cli/generate's sampling.py dispatches at alpha==1): the
                # full-res prev-toRGB + blend path is statically absent
                img = G.apply(params, z + acc * 1e-6, depth, alpha,
                              fade=bool(alpha < 1.0))
                return acc + jnp.mean(img), None

            acc, _ = jax.lax.scan(body, seed, zs)
            return acc

        fn = jax.jit(sample_many)
        zs = jax.device_put(np.random.RandomState(depth).randn(
            K, batch, G.latent_size).astype(np.float32))
        acc = fn(params, zs, jnp.float32(0.0))
        float(acc)  # compile + warm + drain the dispatch queue

        times = []
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            acc = fn(params, zs, acc)
            float(acc)  # host fetch is the only true sync (see header)
            times.append((time.perf_counter() - t0) / (K * batch))
        per_img = min(times)  # seconds per image, min-estimator
        line = (f"depth {depth} ({res:4}px, b{batch:2}): "
                f"{per_img * 1e3 * batch:8.2f} ms/batch  "
                f"{1.0 / per_img:10.1f} img/s")
        if want_selftime:
            from pggan_tpu.utils.profiling import self_time_ms_per_step

            def run(acc=acc):
                float(fn(params, zs, acc))

            ms_batch = self_time_ms_per_step(run, K)
            line += (f"   self {ms_batch:7.2f} ms/batch "
                     f"{batch / ms_batch * 1e3:10.1f} img/s")
        print(line)


if __name__ == "__main__":
    main()
