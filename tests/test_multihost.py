"""True multi-host data parallelism test: 2 processes x 4 virtual CPU devices
with gloo collectives, per-host batch shards assembled into global arrays —
the CPU-testable equivalent of a 2-host TPU slice (SURVEY.md §2.8).

Asserts: both hosts converge to identical params (replicated state), the
result equals a single-process 8-device run on the concatenated batch, and
the nimg clock counts the *global* batch.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                           process_id=pid)
import numpy as np
from pggan_tpu.models import Generator, Discriminator
from pggan_tpu.parallel.mesh import data_parallel_mesh
from pggan_tpu.training.state import init_state, make_optimizer
from pggan_tpu.training.steps import TrainStepBuilder
from pggan_tpu.training.trainer import Trainer

SHAPE = (64, 1, 16, 16)
g = Generator(SHAPE, latent_size=16, fmap_base=64, fmap_max=32)
d = Discriminator(SHAPE, fmap_base=64, fmap_max=32)
opt = make_optimizer()
keys = jax.random.split(jax.random.PRNGKey(7), 3)
state = init_state(g.init(keys[0]), d.init(keys[1]), opt, keys[2])
mesh = data_parallel_mesh()
builder = TrainStepBuilder(g, d, opt, mesh=mesh)

GLOBAL_B = 8
local = GLOBAL_B // nproc
rng = np.random.RandomState(0)
batches = [rng.randn(GLOBAL_B, 8, 8, 1).astype(np.float32) for _ in range(3)]
my_batches = [b[pid * local:(pid + 1) * local] for b in batches]

trainer = Trainer(g, d, builder, state, None, iter(my_batches),
                  lambda: None)
trainer.depth, trainer.lr_d, trainer.lr_g = 1, 1e-3, 1e-3
for _ in range(3):
    trainer.train()
leaves = jax.tree_util.tree_leaves(jax.device_get(trainer.state.g_params))
checksum = float(sum(np.abs(l).astype(np.float64).sum() for l in leaves))
print(f"RESULT pid={pid} nimg={trainer.cur_nimg} checksum={checksum:.8f}",
      flush=True)
"""


def _run_workers(worker_src: str, tmp_path, n_proc: int = 2) -> dict:
    """Spawn ``n_proc`` coordinator-connected worker processes and collect
    their RESULT lines keyed by pid."""
    tmp_path.mkdir(parents=True, exist_ok=True)
    worker = tmp_path / "worker.py"
    worker.write_text(worker_src)
    import socket
    with socket.socket() as s:  # reserve a free port for the coordinator
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), str(n_proc), port],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(n_proc)]
    outs = [p.communicate(timeout=570)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                parts = dict(kv.split("=") for kv in line.split()[1:])
                results[int(parts["pid"])] = parts
    assert set(results) == set(range(n_proc)), outs
    return results


def test_two_process_dp_matches_single_process(tmp_path):
    results = _run_workers(WORKER, tmp_path)
    # both hosts hold identical replicated params
    assert results[0]["checksum"] == results[1]["checksum"]
    # nimg counts the global batch: 3 iterations x 8
    assert int(results[0]["nimg"]) == 24

    # ground truth: single-process 8-device run on the same global batches
    import jax
    from pggan_tpu.models import Discriminator, Generator
    from pggan_tpu.parallel.mesh import data_parallel_mesh
    from pggan_tpu.training.state import init_state, make_optimizer
    from pggan_tpu.training.steps import TrainStepBuilder
    from pggan_tpu.training.trainer import Trainer

    SHAPE = (64, 1, 16, 16)
    g = Generator(SHAPE, latent_size=16, fmap_base=64, fmap_max=32)
    d = Discriminator(SHAPE, fmap_base=64, fmap_max=32)
    opt = make_optimizer()
    keys = jax.random.split(jax.random.PRNGKey(7), 3)
    state = init_state(g.init(keys[0]), d.init(keys[1]), opt, keys[2])
    builder = TrainStepBuilder(g, d, opt, mesh=data_parallel_mesh(8))
    rng = np.random.RandomState(0)
    batches = [rng.randn(8, 8, 8, 1).astype(np.float32) for _ in range(3)]
    trainer = Trainer(g, d, builder, state, None, iter(batches), lambda: None)
    trainer.depth, trainer.lr_d, trainer.lr_g = 1, 1e-3, 1e-3
    for _ in range(3):
        trainer.train()
    leaves = jax.tree_util.tree_leaves(jax.device_get(trainer.state.g_params))
    checksum = float(sum(np.abs(l).astype(np.float64).sum() for l in leaves))
    np.testing.assert_allclose(checksum, float(results[0]["checksum"]),
                               rtol=1e-6)


# ---------------------------------------------------------------------------
# The pod-default configuration (VERDICT r3 weak #6): uint8 device-side input
# prep x grouped dispatch x multi-process. Each host ships raw uint8 shards;
# the fused on-device prep blends a per-step fade-alpha vector; 4 steps run
# per compiled dispatch. Must equal the single-process 8-device ground truth.

GROUPED_WORKER_BODY = r"""
import numpy as np
from types import SimpleNamespace
from pggan_tpu.models import Generator, Discriminator
from pggan_tpu.parallel.mesh import data_parallel_mesh
from pggan_tpu.training.state import init_state, make_optimizer
from pggan_tpu.training.steps import TrainStepBuilder
from pggan_tpu.training.trainer import Trainer

SHAPE = (64, 1, 16, 16)
g = Generator(SHAPE, latent_size=16, fmap_base=64, fmap_max=32)
d = Discriminator(SHAPE, fmap_base=64, fmap_max=32)
opt = make_optimizer()
keys = jax.random.split(jax.random.PRNGKey(7), 3)
state = init_state(g.init(keys[0]), d.init(keys[1]), opt, keys[2])
mesh = data_parallel_mesh()
builder = TrainStepBuilder(g, d, opt, mesh=mesh)

GLOBAL_B, SPD, DISPATCHES = 8, 4, 2
local = GLOBAL_B // nproc
rng = np.random.RandomState(0)
batches = [rng.randint(0, 256, (GLOBAL_B, 8, 8, 1), dtype=np.uint8)
           for _ in range(SPD * DISPATCHES)]
my_batches = [b[pid * local:(pid + 1) * local] for b in batches]

dataset = SimpleNamespace(range_in=(0, 255), range_out=(-1, 1))
trainer = Trainer(g, d, builder, state, dataset, iter(my_batches),
                  lambda: None, steps_per_dispatch=SPD)
trainer.depth, trainer.lr_d, trainer.lr_g = 1, 1e-3, 1e-3
trainer.minibatch_size = GLOBAL_B
# mid-fade window with an nimg-pure alpha law: grouped dispatch must drive
# the model blend AND the uint8 data fade with the exact per-step vector
trainer.alpha = 0.5
trainer.schedule_horizon = lambda nimg: float("inf")
trainer.fade_horizon = lambda nimg: float("inf")
trainer.alpha_lookahead = lambda nimg: (1, 0.2 + nimg / 1000.0)
for _ in range(DISPATCHES):
    trainer.train()
assert trainer.iterations == SPD * DISPATCHES, trainer.iterations
leaves = jax.tree_util.tree_leaves(jax.device_get(
    (trainer.state.g_params, trainer.state.d_params)))
checksum = float(sum(np.abs(l).astype(np.float64).sum() for l in leaves))
print(f"RESULT pid={pid} nimg={trainer.cur_nimg} iters={trainer.iterations} "
      f"checksum={checksum:.8f}", flush=True)
"""

GROUPED_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                           process_id=pid)
""" + GROUPED_WORKER_BODY

SINGLE_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
pid, nproc, port = 0, 1, None
""" + GROUPED_WORKER_BODY


def test_grouped_uint8_two_process_matches_single_process(tmp_path):
    results = _run_workers(GROUPED_WORKER, tmp_path)
    assert results[0]["checksum"] == results[1]["checksum"]
    # nimg counts the GLOBAL batch across every step of every dispatch
    assert int(results[0]["nimg"]) == 8 * 4 * 2
    assert int(results[0]["iters"]) == 8

    # ground truth: one process, 8 devices, same global uint8 batches —
    # run in a subprocess too so the device-count env matches exactly
    single = _run_workers(SINGLE_WORKER, tmp_path / "single", n_proc=1)
    np.testing.assert_allclose(float(single[0]["checksum"]),
                               float(results[0]["checksum"]), rtol=1e-6)
    assert int(single[0]["nimg"]) == 64
