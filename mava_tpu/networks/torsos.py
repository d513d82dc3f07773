"""Network torsos (feature extractors).

Capability parity with reference `mava/networks.py:39-85` (MLPTorso, CNNTorso):
orthogonal(sqrt(2)) kernels, optional scale-free LayerNorm, relu/tanh activations.
Init scales are kept identical to the reference since they matter for curve matching
(SURVEY.md hard part #3).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.linen.initializers import orthogonal


def parse_activation_fn(name: str):
    return {"relu": nn.relu, "tanh": nn.tanh}[name]


class MLPTorso(nn.Module):
    """A stack of Dense layers.

    Inputs of shape (..., features) are processed with the leading dims flattened into
    one big batch so each matmul is a single large MXU op.
    """

    layer_sizes: Sequence[int]
    activation: str = "relu"
    use_layer_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = parse_activation_fn(self.activation)
        for size in self.layer_sizes:
            x = nn.Dense(size, kernel_init=orthogonal(np.sqrt(2)))(x)
            if self.use_layer_norm:
                x = nn.LayerNorm(use_scale=False)(x)
            x = act(x)
        return x


class CNNTorso(nn.Module):
    """A stack of Conv layers; collapses (H, W, C) into one feature axis at the end,
    keeping any batch/agent/time leading dims (reference `networks.py:61-85`).

    `compute_dtype: bfloat16` runs the convolutions in bf16 (params and outputs stay
    float32) — the CNN path is conv-flop-bound on the MXU, where bf16 doubles peak.
    Opt-in via the network config; default float32 matches the reference numerics.
    """

    channel_sizes: Sequence[int]
    kernel_sizes: Sequence[int]
    strides: Sequence[int]
    activation: str = "relu"
    use_layer_norm: bool = False
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = parse_activation_fn(self.activation)
        dtype = jnp.dtype(self.compute_dtype)
        x = x.astype(dtype)
        for channel, kernel, stride in zip(
            self.channel_sizes, self.kernel_sizes, self.strides
        ):
            x = nn.Conv(channel, (kernel, kernel), (stride, stride), dtype=dtype)(x)
            if self.use_layer_norm:
                x = nn.LayerNorm(use_scale=False, dtype=dtype)(x)
            x = act(x)
        # Merge the trailing (H, W, C) dims into a single feature axis.
        return jax.lax.collapse(x.astype(jnp.float32), x.ndim - 3)
