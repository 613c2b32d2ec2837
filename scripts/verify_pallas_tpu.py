#!/usr/bin/env python
"""Compiled-Mosaic parity gate: every Pallas-envelope conv shape vs lax, on
the real TPU.

The CPU suite runs the kernels in interpret mode (tests/conftest.py); this
script is the scripted equivalent of the "re-checked on TPU per change"
discipline — run it whenever kernel code changes (see
.claude/skills/verify/SKILL.md). For every (H, C, K, W) product shape the
paper-config models put on the spatial-lanes path (Generator tail +
Discriminator head envelopes at depths 6-8), it checks against the XLA
reference formulation:

  - conv3x3 forward (bit-level tolerance),
  - conv3x3_dw (the weight-gradient kernel) vs the shifted-slice einsum,
  - the fused epilogue variants (bias+lrelu, bias+lrelu+pixelnorm),
  - a WGAN-GP-style grad-of-grad scalar through the fused primitive.

Exit code 0 = all green. Usage:
    PYTHONPATH=.:/root/.axon_site python scripts/verify_pallas_tpu.py [--fast]
(--fast truncates H to 256 per shape: catches Mosaic lowering regressions
in seconds; the full run also exercises deep grids / double-buffer paths.)
"""

import sys

import numpy as np


def envelope_shapes(fast: bool):
    """Unique (H, C, K, W) conv3x3 shapes on the Pallas path for the paper
    config (fmap_base 4096), mirroring Generator._pallas_tail_start /
    Discriminator._pallas_span."""
    from pggan_tpu.models import Discriminator, Generator

    ref_shape = (1, 3, 1024, 1024)
    G = Generator(ref_shape)
    D = Discriminator(ref_shape)
    shapes = set()
    for depth in range(1, G.max_depth + 1):
        start = G._pallas_tail_start(depth)
        if start is not None:
            for i in range(start, depth):
                res = 2 ** (i + 3)  # stage (block) i convolves at 2**(i+3)
                shapes.add((res, G.nf(i + 1), G.nf(i + 2), res))  # c1
                shapes.add((res, G.nf(i + 2), G.nf(i + 2), res))  # c2
        span = D._pallas_span(depth)
        if span > 0:
            res = D.resolution_at(depth)
            shapes.add((res, D.nf(depth + 1), D.nf(depth + 1), res))  # c1
            shapes.add((res, D.nf(depth + 1), D.nf(depth), res))      # c2
            for i in range(depth, depth - span + 1, -1):
                r2 = D.resolution_at(i - 1)
                shapes.add((r2, D.nf(i), D.nf(i), r2))
                shapes.add((r2, D.nf(i), D.nf(i - 1), r2))
    if fast:
        shapes = {(min(h, 256), c, k, w) for h, c, k, w in shapes}
    return sorted(shapes)


def main():
    from pggan_tpu.utils.misc import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()  # remote compiles are minutes; cache across runs
    fast = "--fast" in sys.argv
    import jax
    import jax.numpy as jnp
    import pggan_tpu.ops.pallas_conv as pc

    assert jax.default_backend() == "tpu", (
        "this is the COMPILED-kernel gate; run it against the TPU "
        f"(got backend {jax.default_backend()})")

    shapes = envelope_shapes(fast)
    print(f"{len(shapes)} envelope shapes: {shapes}", flush=True)
    rng = np.random.RandomState(0)
    failures = []

    def check(name, got, want, rtol, atol):
        got, want = np.asarray(got), np.asarray(want)
        err = np.max(np.abs(got - want) / (np.abs(want) + atol / rtol))
        ok = err <= rtol
        print(f"  {name:28s} max rel err {err:9.2e}  "
              f"{'ok' if ok else 'FAIL'}", flush=True)
        if not ok:
            failures.append((shape, name, float(err)))

    for shape in shapes:
        h, c, k, w = shape
        print(f"shape H={h} C={c} K={k} W={w}:", flush=True)
        x = jnp.asarray(rng.randn(1, h, c, w).astype(np.float32))
        wt = jnp.asarray((rng.randn(3, 3, c, k) * 0.3).astype(np.float32))
        b = jnp.asarray(rng.randn(k).astype(np.float32))
        ct = jnp.asarray(rng.randn(1, h, k, w).astype(np.float32))

        # forward kernel (compiled) vs lax
        got = jax.jit(lambda x, wt: pc.conv3x3_small_c(
            x, wt, interpret=False))(x, wt)
        want = jax.jit(pc._lax_conv)(x, wt)
        check("conv3x3 fwd", got, want, 1e-4, 1e-4)

        # dw kernel (compiled) vs shifted-slice einsum
        got = jax.jit(lambda x, ct: pc.conv3x3_dw_small_c(
            x, ct, interpret=False))(x, ct)
        want = jax.jit(pc._dw_einsum)(x, ct)
        check("conv3x3_dw", got, want, 1e-3, 1e-3)

        # fused epilogues vs composition
        def composed(x, wt, b, pn):
            y = pc._lax_conv(x, wt) + b[None, None, :, None]
            z = jnp.where(y >= 0, y, 0.2 * y)
            if pn:
                z = z * jax.lax.rsqrt(
                    jnp.mean(z * z, axis=2, keepdims=True) + 1e-8)
            return z

        got = jax.jit(lambda x, wt, b: pc.conv3x3_act(
            x, wt, b, slope=0.2))(x, wt, b)
        check("conv3x3_act fused", got,
              jax.jit(lambda x, wt, b: composed(x, wt, b, False))(x, wt, b),
              1e-4, 1e-4)
        got = jax.jit(lambda x, wt, b: pc.conv3x3_act_pn(
            x, wt, b, slope=0.2))(x, wt, b)
        check("conv3x3_act_pn fused", got,
              jax.jit(lambda x, wt, b: composed(x, wt, b, True))(x, wt, b),
              1e-4, 1e-4)

        # GP-style grad-of-grad through the fused primitive (compiled):
        # d/dw of || d/dx sum(f(x, w, b)) ||^2 — the reverse-over-reverse
        # pattern of the WGAN-GP loss (losses.py:27-44)
        def gp_scalar(f):
            def inner(wt_):
                gx = jax.grad(lambda xx: jnp.sum(f(xx, wt_, b)))(x)
                return jnp.sum(jnp.square(gx)) / gx.size
            return jax.jit(jax.grad(inner))(wt)

        got = gp_scalar(lambda x, wt, b: pc.conv3x3_act(x, wt, b, slope=0.2))
        want = gp_scalar(lambda x, wt, b: composed(x, wt, b, False))
        check("grad-of-grad (act)", got, want, 1e-3, 1e-4)

    print()
    if failures:
        print(f"FAILED: {failures}")
        return 1
    print(f"ALL GREEN: {len(shapes)} shapes x 5 checks (compiled Mosaic "
          "vs XLA reference)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
