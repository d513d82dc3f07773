"""Joint-action utilities for centralised critics over continuous actions
(reference `mava/utils/centralised_training.py:24-95`)."""

from __future__ import annotations

import jax.numpy as jnp


def get_joint_action(actions: jnp.ndarray) -> jnp.ndarray:
    """(B, A, act) -> (B, A, A*act): every agent's critic sees the full joint action."""
    batch, agents, act = actions.shape
    joint = actions.reshape(batch, 1, agents * act)
    return jnp.broadcast_to(joint, (batch, agents, agents * act))


def get_updated_joint_actions(
    old_actions: jnp.ndarray, new_actions: jnp.ndarray
) -> jnp.ndarray:
    """For each agent a: the joint action where all agents play their replayed action
    except agent a, who plays its fresh policy action (the MASAC actor-loss input)."""
    batch, agents, act = old_actions.shape
    joint = jnp.broadcast_to(
        old_actions.reshape(batch, 1, agents, act), (batch, agents, agents, act)
    )
    idx = jnp.arange(agents)
    joint = joint.at[:, idx, idx, :].set(new_actions)
    return joint.reshape(batch, agents, agents * act)
