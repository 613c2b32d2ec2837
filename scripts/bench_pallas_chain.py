#!/usr/bin/env python
"""A/B the full 1024px D-entry chain (fromRGB 1x1 -> two 3x3 convs -> pool,
forward+backward): NHWC/XLA vs NHCW with the spatial-lanes Pallas conv.
Round-1 result on TPU v5e: 25.4 vs 44.4 ms steady-state (1.75x).
Methodology per BASELINE.md (data-fetch sync, first round discarded)."""
# Full D-entry chain at 1024px, fwd+bwd: NHWC/XLA vs NHCW/Pallas(3x3)+einsum(1x1)
import time
import numpy as np, jax, jax.numpy as jnp
from pggan_tpu.ops.pallas_conv import conv3x3

def lrelu(x): return jnp.where(x >= 0, x, 0.2 * x)

rng = np.random.RandomState(0)
N, C0, C1, C2, H = 3, 3, 16, 32, 1024
x_nhwc = jnp.asarray(rng.randn(N, H, H, C0).astype(np.float32))
x_nhcw = x_nhwc.transpose(0, 1, 3, 2)
w_rgb = jnp.asarray((rng.randn(1, 1, C0, C1) * 0.3).astype(np.float32))
w1 = jnp.asarray((rng.randn(3, 3, C1, C1) * 0.08).astype(np.float32))
w2 = jnp.asarray((rng.randn(3, 3, C1, C2) * 0.08).astype(np.float32))

def chain_xla(params, x):  # NHWC
    wr, wa, wb = params
    h = jax.lax.conv_general_dilated(x, wr, (1,1), ((0,0),(0,0)),
        dimension_numbers=("NHWC","HWIO","NHWC"))
    h = lrelu(h)
    h = jax.lax.conv_general_dilated(h, wa, (1,1), ((1,1),(1,1)),
        dimension_numbers=("NHWC","HWIO","NHWC"))
    h = lrelu(h)
    h = jax.lax.conv_general_dilated(h, wb, (1,1), ((1,1),(1,1)),
        dimension_numbers=("NHWC","HWIO","NHWC"))
    h = lrelu(h)
    h = jax.lax.reduce_window(h, 0., jax.lax.add, (1,2,2,1),(1,2,2,1),'VALID')*0.25
    return jnp.sum(h * h)

def chain_pallas(params, x):  # NHCW
    wr, wa, wb = params
    h = jnp.einsum('nhcw,ck->nhkw', x, wr[0,0])
    h = lrelu(h)
    h = lrelu(conv3x3(h, wa))
    h = lrelu(conv3x3(h, wb))
    h = jax.lax.reduce_window(h, 0., jax.lax.add, (1,2,1,2),(1,2,1,2),'VALID')*0.25
    return jnp.sum(h * h)

fx = jax.jit(jax.grad(chain_xla, argnums=1))
fp = jax.jit(jax.grad(chain_pallas, argnums=1))
px, pp = (w_rgb, w1, w2), (w_rgb, w1, w2)
gx = fx(px, x_nhwc); gp = fp(pp, x_nhcw)
print("grad diff:", float(jnp.abs(gx.transpose(0,1,3,2) - gp).max()), flush=True)

def sync(r): return float(jnp.sum(r[0,0,:8,:8] if r.ndim==4 else r))
for rnd in range(4):
    out=[]
    for name, f, p, arg in (("xla", fx, px, x_nhwc), ("pallas", fp, pp, x_nhcw)):
        t0=time.perf_counter()
        r=None
        for _ in range(20): r = f(p, arg)
        sync(r)
        out.append(f"{name} {(time.perf_counter()-t0)/20*1000:8.3f} ms")
    print(" | ".join(out), "(discard)" if rnd==0 else "", flush=True)
