"""Learning-rate / entropy schedules (reference `mava/utils/training.py:20-64`)."""

from __future__ import annotations

from typing import Callable, Union

import jax.numpy as jnp
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


def entropy_coefficient(config, actor_opt_state):
    """PPO entropy coefficient — constant `system.ent_coef` by default; if
    `system.ent_coef_final` is set, linearly annealed from `ent_coef` to it over
    every minibatch update of the run.

    The schedule position is read from the Adam step count already carried in the
    actor optimizer state, so no extra counter enters the learner state (and the
    anneal is exact under any num_updates_per_eval chunking). High-early /
    low-late entropy is the standard exploration schedule for sparse-reward maps
    (e.g. SMAX 3s_vs_5z) where a fixed coefficient either kills convergence (too
    high) or exploration (too low). Extends the reference (fixed `ent_coef`,
    `mava/systems/ppo/anakin/rec_ippo.py` loss) behind a default-off knob.
    """
    init = config.system.ent_coef
    final = config.system.get("ent_coef_final", None)
    if final is None:
        return init
    total = (
        config.system.ppo_epochs
        * config.system.num_minibatches
        * config.system.num_updates
    )
    count = optax.tree_utils.tree_get(actor_opt_state, "count")
    frac = jnp.minimum(count / total, 1.0)
    return init + (final - init) * frac


def make_optimizer(lr, max_grad_norm: float) -> optax.GradientTransformation:
    """Global-norm-clipped Adam with eps=1e-5 (the reference's exact optimizer,
    `ff_ippo.py:375-382` — eps matters for curve matching)."""
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adam(lr, eps=1e-5),
    )
