#!/usr/bin/env python
"""Same-session A/B of the fused conv-pair serving chain (VERDICT r4 #5).

Compares generator-only serving throughput WITH vs WITHOUT
``Generator.inference_chain`` (ops/pallas_chain.py — each tail block's conv
pair as one Pallas kernel, intermediate never touching HBM), interleaved in
ONE process per the BASELINE.md measurement rules (chained-checksum scan
programs, host-fetch sync, min over alternating rounds), plus a compiled
parity check of the fused kernel against the unchained tail on the chip.

Usage: scripts/ab_chain_serving.py [--batch N] [--selftime] [DEPTH ...]
(default depths 7 8 — the serving tail the fusion targets; default batch 16,
the BASELINE.md serving batch)
"""

import sys
import time

import numpy as np

SCAN_LEN = {5: 32, 6: 16, 7: 16, 8: 16}
ROUNDS = 6  # alternating A/B/A/B... pairs; first pair discarded


def main():
    import jax
    import jax.numpy as jnp

    from pggan_tpu.models import Generator
    from pggan_tpu.utils.misc import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    args = sys.argv[1:]
    want_selftime = "--selftime" in args
    batch = 16
    if "--batch" in args:
        i = args.index("--batch")
        batch = int(args[i + 1])
        del args[i:i + 2]
    depths = [int(a) for a in args if a.isdigit()] or [7, 8]

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    shape = (1, 3, 1024, 1024)  # paper config, same as bench.py
    G0 = Generator(shape)
    G1 = Generator(shape, inference_chain=True)
    params = G0.init(jax.random.PRNGKey(0))

    for depth in depths:
        K = SCAN_LEN.get(depth, 16)

        def make_fn(G, depth=depth, K=K):
            def sample_many(params, zs, seed):
                def body(acc, z):
                    img = G.apply(params, z + acc * 1e-6, depth, 1.0,
                                  fade=False)
                    return acc + jnp.mean(img), None
                acc, _ = jax.lax.scan(body, seed, zs)
                return acc
            return jax.jit(sample_many)

        # --- compiled parity on the chip (one batch, direct apply) --------
        z1 = jax.device_put(np.random.RandomState(1).randn(
            4, G0.latent_size).astype(np.float32))
        a = np.asarray(jax.jit(
            lambda p, z: G0.apply(p, z, depth, 1.0, fade=False))(params, z1))
        b = np.asarray(jax.jit(
            lambda p, z: G1.apply(p, z, depth, 1.0, fade=False))(params, z1))
        diff = float(np.abs(a - b).max())
        scale = float(np.abs(a).max())
        print(f"depth {depth}: chain parity max|diff| = {diff:.3e} "
              f"(max|ref| {scale:.3f})", flush=True)
        assert diff <= 1e-4 * max(scale, 1.0), "chain kernel diverges"

        fns = {"plain": make_fn(G0), "chain": make_fn(G1)}
        zs = jax.device_put(np.random.RandomState(depth).randn(
            K, batch, G0.latent_size).astype(np.float32))
        accs = {k: f(params, zs, jnp.float32(0.0)) for k, f in fns.items()}
        for k in fns:
            float(accs[k])  # compile + drain

        times = {k: [] for k in fns}
        for rnd in range(ROUNDS):
            for k, f in fns.items():
                t0 = time.perf_counter()
                accs[k] = f(params, zs, accs[k])
                float(accs[k])
                if rnd > 0:
                    times[k].append((time.perf_counter() - t0) / (K * batch))
        line = f"depth {depth} (b{batch}):"
        per = {}
        for k in fns:
            per[k] = min(times[k])
            line += f"  {k} {per[k] * 1e3 * batch:8.2f} ms/batch" \
                    f" {1.0 / per[k]:9.1f} img/s"
        line += f"  -> chain speedup x{per['plain'] / per['chain']:.3f}"
        print(line, flush=True)

        if want_selftime:
            from pggan_tpu.utils.profiling import self_time_ms_per_step
            for k, f in fns.items():
                def run(k=k, f=f):
                    float(f(params, zs, accs[k]))
                ms = self_time_ms_per_step(run, K)
                print(f"  self-time {k}: {ms:8.2f} ms/batch "
                      f"{batch / ms * 1e3:9.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
