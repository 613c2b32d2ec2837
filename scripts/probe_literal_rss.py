#!/usr/bin/env python
"""Host-RSS probe for input-literal retention in the device client.

Ships K distinct (or repeated) ~288 MB host batches through a trivial
jitted reduction — exactly the transfer pattern of one depth-8 grouped
training dispatch — forces each result to host, drops every reference,
and prints VmRSS/VmHWM after each round.

Round-5 findings on this environment's axon tunnel backend (each mode
K=6, values GiB; see BASELINE.md "H5 windowed-streaming leg"):

  numpy  (jit(np_array), trainer's path): 0.75 -> 2.16, +288 MB per call
  repeat (same identical array each call): 0.75 -> 2.16, +288 MB per call
  put    (device_put + Array.delete()):    0.75 -> 2.16, +288 MB per call
  cpu    (numpy mode, CPU backend):        0.49 flat

i.e. the tunnel client retains EVERY host->device input literal
unconditionally — completion, gc, and explicit delete() do not release it,
and it is not a content-keyed cache (repeats leak too). The CPU control
shows JAX itself (and this framework's dispatch path) is leak-free: the
PJRT contract frees input staging at completion. Framework-side mitigation
is to ship fewer bytes (``--device_input_prep`` uint8 batches, 4x smaller);
``Trainer.inflight_budget_mb`` bounds only what PENDING dispatches pin,
which is the component a healthy client can actually release.

Usage: scripts/probe_literal_rss.py [numpy|repeat|put|cpu] [K]
"""
import gc
import os
import sys


def rss():
    out = {}
    for line in open(f"/proc/{os.getpid()}/status"):
        if line.startswith(("VmRSS", "VmHWM")):
            k, v = line.split()[:2]
            out[k.rstrip(":")] = int(v) / 1048576
    return out


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "numpy"
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    if mode == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import numpy as np
    import jax
    if mode == "cpu":
        jax.config.update("jax_platforms", "cpu")
        mode = "numpy"
    import jax.numpy as jnp

    f = jax.jit(lambda x: jnp.float32(jnp.mean(x)))
    shape = (24, 3, 1024, 1024)  # one depth-8 grouped dispatch, 288 MB f32
    base = np.random.RandomState(0).rand(*shape).astype(np.float32)
    print(f"device={jax.devices()[0]} mode={mode} K={K} "
          f"bytes/literal={base.nbytes / 1048576:.0f} MB start={rss()}",
          flush=True)
    for k in range(K):
        x = base if mode == "repeat" else base + np.float32(k)
        if mode == "put":
            xd = jax.device_put(x)
            r = float(f(xd))
            xd.delete()
        else:
            r = float(f(x))
        del x
        gc.collect()
        m = rss()
        print(f"  k={k} r={r:.4f} VmRSS={m['VmRSS']:.2f} GiB "
              f"VmHWM={m['VmHWM']:.2f} GiB", flush=True)


if __name__ == "__main__":
    main()
