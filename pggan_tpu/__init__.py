"""pggan_tpu — a TPU-native (JAX/XLA/pjit/Pallas) framework for Progressive
Growing of GANs with WGAN-GP loss.

Built from scratch with the same capabilities as the PyTorch reference
``deepsound-project/pggan-pytorch`` (see SURVEY.md for the structural map),
re-designed for TPU hardware:

- NHWC layouts and XLA convolutions mapped onto the MXU.
- Pure-functional Generator/Discriminator with per-depth jit-compiled apply
  functions; the fade-in ``alpha`` is a traced scalar so stage transitions do
  not recompile within a depth.
- A single fused G+D train step (``jax.grad``-of-grad for the WGAN gradient
  penalty) with donated state buffers.
- Data parallelism over a ``jax.sharding.Mesh`` via GSPMD: batch axis sharded,
  params replicated, gradient all-reduce and the global minibatch-stddev
  statistic handled by XLA collectives over ICI.
- A host-side plugin/tick runtime mirroring the reference trainer's
  iteration/epoch/end queues, checkpointing, sample generation and stats.
"""

__version__ = "0.1.0"

from pggan_tpu.models.generator import Generator
from pggan_tpu.models.discriminator import Discriminator
from pggan_tpu.losses import wgan_gp_D_loss, wgan_gp_G_loss
from pggan_tpu.checkpoint import load_snapshot, save_snapshot

__all__ = [
    "Generator",
    "Discriminator",
    "wgan_gp_D_loss",
    "wgan_gp_G_loss",
    "load_snapshot",
    "save_snapshot",
    "__version__",
]
