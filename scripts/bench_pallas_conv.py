#!/usr/bin/env python
"""A/B the spatial-lanes Pallas 3x3 conv against lax.conv on the TPU at the
1024px small-channel config (the profiled bottleneck of the final growth
stage). Round-1 result on TPU v5e: ~4.0 ms vs ~8.3 ms steady-state (2.1x),
bit-accurate (max diff 7e-7). Methodology per BASELINE.md: data-fetch sync,
first round discarded."""

import time

import numpy as np

import jax
import jax.numpy as jnp

from pggan_tpu.ops.pallas_conv import conv3x3_small_c


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 1024, 16, 1024).astype(np.float32))  # NHCW
    xh = x.transpose(0, 1, 3, 2)
    w = jnp.asarray((rng.randn(3, 3, 16, 16) * 0.05).astype(np.float32))

    pallas_fn = jax.jit(lambda x_, w_: conv3x3_small_c(x_, w_))
    xla_fn = jax.jit(lambda x_, w_: jax.lax.conv_general_dilated(
        x_, w_, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")))

    g1 = pallas_fn(x, w)
    g2 = xla_fn(xh, w)
    print("max diff:", float(jnp.abs(g1 - g2.transpose(0, 1, 3, 2)).max()))

    def sync(r):
        return float(jnp.sum(r[0, 0, :8, :8]))

    for rnd in range(4):
        line = []
        for name, f, arg in (("pallas", pallas_fn, x), ("xla", xla_fn, xh)):
            t0 = time.perf_counter()
            r = None
            for _ in range(30):
                r = f(arg, w)
            sync(r)
            line.append(f"{name} {(time.perf_counter() - t0) / 30 * 1000:7.3f} ms")
        print(" | ".join(line), "(discard)" if rnd == 0 else "", flush=True)


if __name__ == "__main__":
    main()
