"""Learning-rate schedules (reference `mava/utils/training.py:20-64`)."""

from __future__ import annotations

from typing import Callable, Union

import optax


def make_learning_rate_schedule(init_lr: float, config) -> Callable[[int], float]:
    """Linear decay to zero over every minibatch update of the run."""
    total_updates = (
        config.system.ppo_epochs
        * config.system.num_minibatches
        * config.system.num_updates
    )

    def linear_schedule(count: int) -> float:
        frac = 1.0 - count / total_updates
        return init_lr * frac

    return linear_schedule


def make_learning_rate(init_lr: float, config) -> Union[float, Callable[[int], float]]:
    if config.system.get("decay_learning_rates", False):
        return make_learning_rate_schedule(init_lr, config)
    return init_lr


def make_optimizer(lr, max_grad_norm: float) -> optax.GradientTransformation:
    """Global-norm-clipped Adam with eps=1e-5 (the reference's exact optimizer,
    `ff_ippo.py:375-382` — eps matters for curve matching)."""
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adam(lr, eps=1e-5),
    )
