"""Small JAX helpers (reference `mava/utils/jax_utils.py`)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def merge_leading_dims(x: jnp.ndarray, num_dims: int) -> jnp.ndarray:
    """Merge the first `num_dims` dimensions into one."""
    return jnp.reshape(x, (-1, *x.shape[num_dims:]))


def unreplicate_n_dims(x: Any, unreplicate_depth: int = 2) -> Any:
    """Take index [0, 0, ...] along the first `unreplicate_depth` axes of every leaf."""
    return jax.tree.map(lambda y: y[(0,) * unreplicate_depth], x)


def unreplicate_batch_dim(x: Any) -> Any:
    """Strip a leading (replicated) batch axis from every leaf."""
    return jax.tree.map(lambda y: y[0], x)


def switch_leading_axes(x: Any) -> Any:
    """Swap the first two axes of every leaf ((B, T, ...) <-> (T, B, ...))."""
    return jax.tree.map(lambda y: jnp.swapaxes(y, 0, 1), x)


def select_along_last(values: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
    """values[..., index] for a small last axis, as a one-hot multiply-sum.

    `take_along_axis` on the minor (lane) axis lowers to a per-element gather,
    which is very slow on TPU; for small trailing axes (actions, q-heads) the
    one-hot select fuses on the VPU instead. Out-of-range indices clamp like
    gather would, rather than silently contributing 0."""
    index = jnp.clip(index, 0, values.shape[-1] - 1)
    onehot = index[..., None] == jnp.arange(values.shape[-1])
    return jnp.sum(jnp.where(onehot, values, 0), axis=-1)
