#!/usr/bin/env python
"""Measure the AOT artifact's portability tax (VERDICT r4 next #4).

cli/export.py deliberately strips the Pallas tail from artifacts (Mosaic
custom calls are outside StableHLO's compatibility surface — export.py
module docstring), so a deployed artifact runs the pure-XLA generator
graph. This script puts a number on what that portability costs vs the
in-process serving path (sampling.py with the Pallas envelope), same
session, interleaved (BASELINE.md measurement rules: chained-checksum scan
programs, host-fetch sync, min over alternating rounds):

  A. chain   — in-process G.apply, fused conv-pair serving chain ON
               (cli/generate.py's shipping default)
  B. pallas  — in-process G.apply, per-conv Pallas tail (training-parity
               envelope, chain off)
  C. xla     — in-process G.apply with pallas_tail=False (what the
               artifact's graph computes, pre-serialization)
  D. aot     — the DESERIALIZED StableHLO artifact executed via
               jax.export ``.call`` inside the same scan program

B isolates the graph difference from the serialization round-trip: aot vs
xla should be ~equal (same HLO), pallas vs aot is the portability tax.

Usage: scripts/ab_aot_tax.py [--batch N] [DEPTH ...]  (defaults: b16, 5-8)
"""

import sys
import time

import numpy as np

SCAN_LEN = {5: 32, 6: 16, 7: 16, 8: 8}
ROUNDS = 6


def main():
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from pggan_tpu.export import export_generator
    from pggan_tpu.models import Generator
    from pggan_tpu.utils.misc import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    args = sys.argv[1:]
    batch = 16
    if "--batch" in args:
        i = args.index("--batch")
        batch = int(args[i + 1])
        del args[i:i + 2]
    depths = [int(a) for a in args if a.isdigit()] or [5, 6, 7, 8]

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    shape = (1, 3, 1024, 1024)  # paper config, same as bench.py
    G_chain = Generator(shape, inference_chain=True)
    G_pal = Generator(shape)
    G_xla = Generator(shape, pallas_tail=False)
    params = G_pal.init(jax.random.PRNGKey(0))

    for depth in depths:
        K = SCAN_LEN.get(depth, 16)
        # the real deployment path: serialize -> bytes -> deserialize
        art = jax_export.deserialize(
            export_generator(G_pal, params, depth, 1.0, batch).serialize())

        def make_fn(apply_z, depth=depth):
            def sample_many(params_, zs, seed):
                def body(acc, z):
                    img = apply_z(params_, z + acc * 1e-6)
                    return acc + jnp.mean(img), None
                acc, _ = jax.lax.scan(body, seed, zs)
                return acc
            return jax.jit(sample_many)

        fns = {
            "chain": make_fn(lambda p, z: G_chain.apply(p, z, depth, 1.0,
                                                        fade=False)),
            "pallas": make_fn(lambda p, z: G_pal.apply(p, z, depth, 1.0,
                                                       fade=False)),
            "xla": make_fn(lambda p, z: G_xla.apply(p, z, depth, 1.0,
                                                    fade=False)),
            "aot": make_fn(lambda p, z: art.call(z)),  # params baked in
        }
        zs = jax.device_put(np.random.RandomState(depth).randn(
            K, batch, G_pal.latent_size).astype(np.float32))

        # parity: the artifact must serve the same images (fp32 tolerance;
        # the Pallas and XLA graphs reassociate float sums differently)
        z1 = zs[0]
        a = np.asarray(jax.jit(
            lambda p, z: G_pal.apply(p, z, depth, 1.0, fade=False))(
                params, z1))
        c = np.asarray(jax.jit(art.call)(z1))
        print(f"depth {depth}: aot-vs-pallas max|diff| "
              f"{float(np.abs(a - c).max()):.3e} "
              f"(max|ref| {float(np.abs(a).max()):.3f})", flush=True)

        accs = {k: f(params, zs, jnp.float32(0.0)) for k, f in fns.items()}
        for k in fns:
            float(accs[k])
        times = {k: [] for k in fns}
        for rnd in range(ROUNDS):
            for k, f in fns.items():
                t0 = time.perf_counter()
                accs[k] = f(params, zs, accs[k])
                float(accs[k])
                if rnd > 0:
                    times[k].append((time.perf_counter() - t0) / (K * batch))
        per = {k: min(v) for k, v in times.items()}
        print(f"depth {depth} (b{batch}): " + "  ".join(
            f"{k} {per[k] * 1e3 * batch:8.2f} ms/batch "
            f"{1.0 / per[k]:9.1f} img/s" for k in fns)
            + f"  -> aot tax x{per['aot'] / min(per['chain'], per['pallas']):.3f} "
            f"(serialize overhead x{per['aot'] / per['xla']:.3f})",
            flush=True)


if __name__ == "__main__":
    main()
