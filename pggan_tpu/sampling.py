"""Chunked, mesh-sharded generator sampling — the serving path.

The reference samples in one unchunked forward on one GPU
(/root/reference/generate.py:36-40 builds a single ``Variable`` of all
latents; /root/reference/plugins.py OutputGenerator likewise). That shape
both OOMs at large ``num_samples`` and leaves a pod idle. The TPU-native
serving path:

- **chunks** the request into fixed-size minibatches so one compiled
  program serves any ``num_samples`` (the last partial chunk is padded up
  to the same shape — one compile, no retrace);
- **shards** each chunk's batch axis over a 1-D data-parallel mesh of all
  visible devices (params replicated, GSPMD partitions the forward; the
  generator has no cross-batch ops, so sharded == single-device up to
  float reassociation of the differently-fused programs);
- pads the chunk size itself up to a device-count multiple so every
  device stays busy.

Used by cli/generate.py, cli/eval.py, and anything else that needs
"N images from this snapshot" without caring about devices or memory.
"""

from __future__ import annotations

import numpy as np

import jax

from pggan_tpu.utils.misc import random_latents


def sample_images(G, params, depth, alpha, num_samples, *,
                  minibatch=0, rng=None, mesh=None):
    """Draw ``num_samples`` images from ``G.apply`` as float32 NHWC numpy.

    ``minibatch=0`` (default) generates everything in one forward — the
    reference's behavior. With ``minibatch=k``, latents are consumed in
    fixed padded chunks of ``ceil(k / n_dev) * n_dev`` so exactly one
    program is compiled regardless of ``num_samples % k``.

    ``rng`` is a ``np.random.RandomState`` (a fresh seed-0 one if None).
    ``mesh`` overrides the auto-built data-parallel mesh (pass a 1-D mesh
    with axis ``"data"``); with one visible device no mesh is used.
    """
    if rng is None:
        rng = np.random.RandomState(0)
    if int(num_samples) <= 0:
        raise ValueError(f"num_samples must be positive, got {num_samples}")
    alpha = np.float32(alpha)
    # stable snapshots (alpha == 1) serve the fade-free graph: identical
    # values, none of the full-resolution prev-toRGB + blend work
    fade = bool(alpha < 1.0)
    chunk = int(minibatch) if minibatch else int(num_samples)
    if chunk <= 0:
        raise ValueError(f"minibatch/num_samples must be positive, "
                         f"got chunk={chunk}")

    n_dev = jax.device_count() if mesh is None else mesh.size
    padded = ((chunk + n_dev - 1) // n_dev) * n_dev

    shard_in = None
    saved_mesh = None
    if n_dev > 1:
        from pggan_tpu.parallel.mesh import (
            data_parallel_mesh, replicate, shard_batch)
        if mesh is None:
            mesh = data_parallel_mesh()
        params = replicate(params, mesh)
        shard_in = lambda z: shard_batch(z, mesh)  # noqa: E731
        # pallas_call is opaque to GSPMD: the model wraps its Pallas tail in
        # shard_map ONLY over an attached mesh (the contract training uses,
        # training/steps.py) — without it the partitioner all-gathers around
        # the kernels and every device computes the full batch
        saved_mesh = (G.mesh, G.batch_axis)
        G.mesh, G.batch_axis = mesh, mesh.axis_names[0]

    apply_fn = jax.jit(lambda p, z: G.apply(p, z, depth, alpha, fade=fade))

    outs = []
    done = 0
    try:
        while done < num_samples:
            take = min(chunk, num_samples - done)
            z = random_latents(take, G.latent_size, rng)
            if take < padded:  # fixed program shape: pad, run, slice
                z = np.concatenate(
                    [z, np.zeros((padded - take, G.latent_size), z.dtype)])
            if shard_in is not None:
                z = shard_in(z)
            # slice on device: padding rows never cross the host link
            outs.append(np.asarray(apply_fn(params, z)[:take]))
            done += take
    finally:
        if saved_mesh is not None:
            G.mesh, G.batch_axis = saved_mesh
    return np.concatenate(outs) if len(outs) > 1 else outs[0]
