from pggan_tpu.training.state import TrainState, make_optimizer
from pggan_tpu.training.steps import TrainStepBuilder
from pggan_tpu.training.schedule import (
    depth_alpha_schedule,
    lr_rampup,
    minibatch_for_depth,
    tick_kimg_for_depth,
)
from pggan_tpu.training.trainer import Trainer

__all__ = [
    "TrainState",
    "make_optimizer",
    "TrainStepBuilder",
    "depth_alpha_schedule",
    "lr_rampup",
    "minibatch_for_depth",
    "tick_kimg_for_depth",
    "Trainer",
]
