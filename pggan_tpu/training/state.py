"""Device-resident training state + optimizer construction.

The reference keeps optimizer state hidden inside ``torch.optim.Adam`` and
never checkpoints it (SURVEY.md §5 "gap to fix"). Here the full state is one
pytree — G/D params, both Adam states, and the PRNG key — so it can be
donated into the fused step and checkpointed whole.

The clock (``cur_nimg``/``iterations``/tick bookkeeping) intentionally stays
host-side in the Trainer: the progressive-growing schedule is a pure function
of nimg (reference plugins.py:57-63) evaluated on the host, so keeping it off
device avoids a device round-trip per iteration.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import optax


class TrainState(NamedTuple):
    g_params: Any
    d_params: Any
    g_opt: Any
    d_opt: Any
    rng: jax.Array
    # Exponential moving average of g_params (--g_ema_beta; None = disabled).
    # The reference has no EMA; Karras' official implementation smooths G for
    # evaluation/sampling and it measurably improves sample quality. Kept as
    # a trailing default so pre-round-4 training-state pickles (which reduce
    # to ``TrainState(*five_values)``) still load, with g_ema=None.
    g_ema: Any = None


def make_optimizer(b1: float = 0.0, b2: float = 0.99,
                   eps: float = 1e-8) -> optax.GradientTransformation:
    """Adam direction (bias-corrected) *without* the learning rate.

    The reference drives lr through a ``LambdaLR`` ramp keyed on nimg
    (train.py:151-158); here the current lr is a traced scalar multiplied in
    at apply time, so lr changes never recompile the step. Defaults mirror
    the reference's ``Adam(betas=(0.0, 0.99))`` override (train.py:195).
    """
    return optax.scale_by_adam(b1=b1, b2=b2, eps=eps)


def init_state(g_params, d_params, optimizer: optax.GradientTransformation,
               rng: jax.Array) -> TrainState:
    return TrainState(
        g_params=g_params,
        d_params=d_params,
        g_opt=optimizer.init(g_params),
        d_opt=optimizer.init(d_params),
        rng=rng,
    )


def apply_updates(params, updates, lr):
    """params - lr * adam_direction (sign handled here; see make_optimizer)."""
    return jax.tree_util.tree_map(lambda p, u: p - lr * u, params, updates)
