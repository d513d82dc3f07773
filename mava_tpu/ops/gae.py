"""Generalised Advantage Estimation.

Shared by every PPO system (reference duplicates this inline per system,
`mava/systems/ppo/ff_ippo.py:124-151`). The reverse time recursion is inherently
sequential, so it runs as an unrolled `lax.scan` over the time axis with all batch
axes vectorised — each scan step is one fused VPU op over (envs, agents); `unroll=16`
keeps the loop overhead off the critical path (the reference's only scan tuning).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def calculate_gae(
    rewards: jnp.ndarray,  # (T, ...)
    values: jnp.ndarray,  # (T, ...)
    dones: jnp.ndarray,  # (T, ...) — 1.0 where the episode ended at this step
    last_value: jnp.ndarray,  # (...)
    gamma: float,
    gae_lambda: float,
    unroll: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (advantages, targets) with targets = advantages + values."""

    def _step(carry, xs):
        gae, next_value = carry
        done, value, reward = xs
        not_done = 1.0 - done.astype(reward.dtype)
        delta = reward + gamma * next_value * not_done - value
        gae = delta + gamma * gae_lambda * not_done * gae
        return (gae, value), gae

    _, advantages = jax.lax.scan(
        _step,
        (jnp.zeros_like(last_value), last_value),
        (dones, values, rewards),
        reverse=True,
        unroll=unroll,
    )
    return advantages, advantages + values


def calculate_gae_with_next_done(
    rewards: jnp.ndarray,
    values: jnp.ndarray,
    next_dones: jnp.ndarray,  # done flag of the *next* timestep (recurrent systems)
    last_done: jnp.ndarray,
    last_value: jnp.ndarray,
    gamma: float,
    gae_lambda: float,
    unroll: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """GAE variant that masks bootstrap with the done of the step being bootstrapped
    from (reference `rec_ippo.py:181-203` carries `next_done`)."""

    def _step(carry, xs):
        gae, next_value, next_done = carry
        done, value, reward = xs
        not_done = 1.0 - next_done.astype(reward.dtype)
        delta = reward + gamma * next_value * not_done - value
        gae = delta + gamma * gae_lambda * not_done * gae
        return (gae, value, done), gae

    _, advantages = jax.lax.scan(
        _step,
        (jnp.zeros_like(last_value), last_value, last_done),
        (next_dones, values, rewards),
        reverse=True,
        unroll=unroll,
    )
    return advantages, advantages + values
