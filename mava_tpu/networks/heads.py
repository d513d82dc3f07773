"""Action heads producing distributions.

Parity with reference `mava/networks.py:88-169`: discrete masked-categorical head with
orthogonal(0.01) logits layer; continuous tanh-Normal head with state-independent or
state-dependent log-std and softplus scale.
"""

from __future__ import annotations

import jax
from flax import linen as nn
from flax.linen.initializers import orthogonal
import jax.numpy as jnp

from mava_tpu.distributions import MaskedCategorical, TanhNormal
from mava_tpu.types import Observation


class DiscreteActionHead(nn.Module):
    """Dense -> logits, masked by `observation.action_mask`."""

    action_dim: int

    @nn.compact
    def __call__(self, obs_embedding: jnp.ndarray, observation: Observation):
        logits = nn.Dense(self.action_dim, kernel_init=orthogonal(0.01))(obs_embedding)
        return MaskedCategorical(logits, observation.action_mask)


class ContinuousActionHead(nn.Module):
    """Tanh-squashed Normal head; actions in [-1, 1] (reference `networks.py:127-169`)."""

    action_dim: int
    min_scale: float = 1e-3
    independent_std: bool = True

    @nn.compact
    def __call__(self, obs_embedding: jnp.ndarray, observation: Observation):
        loc = nn.Dense(self.action_dim, kernel_init=orthogonal(0.01))(obs_embedding)
        if self.independent_std:
            log_std = self.param("log_std", nn.initializers.zeros, (self.action_dim,))
        else:
            log_std = nn.Dense(self.action_dim, kernel_init=orthogonal(0.01))(
                obs_embedding
            )
        scale = jax.nn.softplus(log_std) + self.min_scale
        scale = jnp.broadcast_to(scale, loc.shape)
        return TanhNormal(loc, scale)
