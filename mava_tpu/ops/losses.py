"""PPO loss primitives, shared across the PPO family.

Semantics match reference `mava/systems/ppo/ff_ippo.py:162-213`: per-minibatch
advantage normalisation, clipped surrogate, and clipped value loss.
"""

from __future__ import annotations

import jax.numpy as jnp


def clipped_ppo_policy_loss(
    log_prob: jnp.ndarray,
    old_log_prob: jnp.ndarray,
    gae: jnp.ndarray,
    clip_eps: float,
) -> jnp.ndarray:
    """Clipped PPO surrogate with per-minibatch advantage normalisation."""
    ratio = jnp.exp(log_prob - old_log_prob)
    gae = (gae - gae.mean()) / (gae.std() + 1e-8)
    loss1 = ratio * gae
    loss2 = jnp.clip(ratio, 1.0 - clip_eps, 1.0 + clip_eps) * gae
    return -jnp.minimum(loss1, loss2).mean()


def clipped_value_loss(
    value: jnp.ndarray,
    old_value: jnp.ndarray,
    targets: jnp.ndarray,
    clip_eps: float,
) -> jnp.ndarray:
    """0.5 * max(unclipped, clipped) squared error."""
    value_clipped = old_value + jnp.clip(value - old_value, -clip_eps, clip_eps)
    losses = jnp.square(value - targets)
    losses_clipped = jnp.square(value_clipped - targets)
    return 0.5 * jnp.maximum(losses, losses_clipped).mean()
