#!/usr/bin/env python
"""A/B the Pallas fused epilogue against XLA's own fusion on the attached
TPU. Interleaved rounds (the chip is behind a shared tunnel; only
within-process comparisons are meaningful — see BASELINE.md)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from pggan_tpu.ops.pallas_kernels import fused_act_pixelnorm
from pggan_tpu.ops.primitives import leaky_relu, pixelnorm


def main():
    shape = (3, 512, 512, 32)  # a high-res G stage activation
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(*shape).astype(np.float32))
    b = jnp.asarray(rng.randn(shape[-1]).astype(np.float32))

    @jax.jit
    def xla_path(z, b):
        return jnp.sum(pixelnorm(leaky_relu(z + b)))

    @jax.jit
    def pallas_path(z, b):
        return jnp.sum(fused_act_pixelnorm(z, b))

    for f in (xla_path, pallas_path):
        f(z, b).block_until_ready()

    for rnd in range(3):
        out = []
        for name, f in (("xla", xla_path), ("pallas", pallas_path)):
            t0 = time.perf_counter()
            for _ in range(50):
                r = f(z, b)
            r.block_until_ready()
            out.append(f"{name} {(time.perf_counter() - t0) / 50 * 1000:.3f} ms")
        print(" | ".join(out), flush=True)


if __name__ == "__main__":
    main()
