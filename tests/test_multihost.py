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


def test_two_process_dp_matches_single_process(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    import socket
    with socket.socket() as s:  # reserve a free port for the coordinator
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen([sys.executable, str(worker), str(i), "2", port],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = [p.communicate(timeout=570)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                parts = dict(kv.split("=") for kv in line.split()[1:])
                results[int(parts["pid"])] = parts
    assert set(results) == {0, 1}, outs
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
