"""Device mesh + sharding utilities: the framework's entire parallelism story.

The reference is single-GPU with bare ``.cuda()`` calls and no distributed
backend (SURVEY.md §2.8). The TPU-native replacement is GSPMD data
parallelism over a 1-D ``Mesh``:

- the batch axis of real images (and hence of latents, which XLA partitions
  to match) is sharded over the ``data`` axis;
- parameters and optimizer state are replicated;
- XLA inserts the gradient all-reduce, the cross-replica reductions inside
  the global minibatch-stddev statistic (ops/primitives.py) and the
  gradient-penalty mean — over ICI within a slice, DCN across slices. No
  hand-written collectives are needed for DP (the psums the reference build
  plan calls out in SURVEY.md §2.8 are emitted by the partitioner because the
  statistics are written as global means).

TP/PP/SP/EP are intentionally not implemented: the model family is a small
conv pyramid with no sequence axis (SURVEY.md §5 "not applicable"); DP is
the whole story and scales to pod slices via ``jax.distributed.initialize``.

Multi-host: each process calls ``initialize_distributed()`` (env-driven),
builds the global mesh over all devices, and feeds only its local batch
shard (see ``data.loader.DataIterator`` shard_index/num_shards).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host initialization over ICI/DCN (the TPU-native equivalent of
    the NCCL/MPI init the reference never had). No-op when single-process
    with no coordinator configured."""
    import os
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return  # single-process (or TPU-pod auto-detected) run
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def data_parallel_mesh(num_devices: int | None = None,
                       axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices
    (default: all)."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(array, mesh: Mesh, axis_name: str = "data",
                batch_dim: int = 0):
    """Place an array with its ``batch_dim`` sharded over ``axis_name``."""
    spec = [None] * array.ndim
    spec[batch_dim] = axis_name
    return jax.device_put(array, NamedSharding(mesh, P(*spec)))


def make_global_batch(local_array, mesh: Mesh, axis_name: str = "data",
                      batch_dim: int = 1):
    """Assemble a global device array from this process's local batch shard
    (multi-host data parallelism: each host loads ``global/process_count``
    items; the global array spans all hosts' devices).

    ``local_array`` is the host-local numpy shard, e.g. (repeats, local_B,
    H, W, C); the returned global array has the batch dim multiplied by
    ``jax.process_count()`` and sharded over ``axis_name``.
    """
    spec = [None] * local_array.ndim
    spec[batch_dim] = axis_name
    sharding = NamedSharding(mesh, P(*spec))
    global_shape = list(local_array.shape)
    global_shape[batch_dim] *= jax.process_count()
    return jax.make_array_from_process_local_data(
        sharding, local_array, tuple(global_shape))


def fit_minibatch_to_mesh(minibatch_default: int, minibatch_overrides,
                          mesh: Mesh, axis_name: str = "data"):
    """Device-count-aware per-depth global-batch policy for pod meshes.

    The reference's per-depth minibatches (16 default; {6:14, 7:6, 8:3} for
    the 1024px config, reference plugins.py:19-20) don't divide a 16- or
    64-device mesh. Rather than failing, round each global batch UP to the
    nearest multiple of the data-axis size: never below the reference batch
    (so gradient noise doesn't increase), and every device stays busy. The
    LR implication — Adam's effective step per image shrinks as the batch
    grows — is opt-in linear scaling via ``--scale_lr_with_batch`` (the
    reference itself never scales LR with batch, so default off).

    Returns ``(default', overrides', changed)`` where ``changed`` maps depth
    (-1 for the default) to ``(old, new)`` for logging.
    """
    n = mesh.shape[axis_name]

    def up(b):
        return ((int(b) + n - 1) // n) * n

    overrides = dict(minibatch_overrides or {})
    new_default = up(minibatch_default)
    new_overrides = {d: up(b) for d, b in overrides.items()}
    changed = {d: (overrides[d], b) for d, b in new_overrides.items()
               if b != overrides[d]}
    if new_default != minibatch_default:
        changed[-1] = (minibatch_default, new_default)
    return new_default, new_overrides, changed


def check_batch_divisible(batch_size: int, mesh: Mesh,
                          axis_name: str = "data") -> None:
    n = mesh.shape[axis_name]
    if batch_size % n != 0:
        raise ValueError(
            f"batch size {batch_size} must be divisible by the {axis_name} "
            f"axis size {n}; override the per-depth minibatch "
            f"(--DepthManager.minibatch_default / .minibatch_overrides) to a "
            f"multiple of the device count")
