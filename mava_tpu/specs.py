"""Array specs used by environments and systems.

A minimal, self-contained replacement for the spec surface the reference gets from
`jumanji.specs` (see reference `mava/types.py:71-103` for the consumed API). Only the
pieces Mava-style systems actually use are provided: shape/dtype carrying specs with
`generate_value()` for network initialisation, plus a pytree-structured `TreeSpec` for
NamedTuple observations.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple, Type

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Array:
    """Describes a jax array with a static shape and dtype."""

    shape: Tuple[int, ...]
    dtype: Any
    name: str = ""

    def generate_value(self) -> jnp.ndarray:
        return jnp.zeros(self.shape, dtype=self.dtype)

    def replace(self, **kwargs: Any) -> "Array":
        return dataclasses.replace(self, **kwargs)


@dataclasses.dataclass(frozen=True)
class BoundedArray(Array):
    """An array spec with inclusive bounds."""

    minimum: Any = None
    maximum: Any = None

    def generate_value(self) -> jnp.ndarray:
        if self.minimum is not None:
            return jnp.full(self.shape, self.minimum, dtype=self.dtype)
        return jnp.zeros(self.shape, dtype=self.dtype)


@dataclasses.dataclass(frozen=True)
class DiscreteArray(Array):
    """An integer array spec where entries live in [0, num_values)."""

    num_values: int = 0

    def generate_value(self) -> jnp.ndarray:
        return jnp.zeros(self.shape, dtype=self.dtype)


class TreeSpec:
    """A spec for a pytree (e.g. a NamedTuple observation).

    Constructed with the container type and per-field specs; `generate_value()` builds a
    zero-filled instance of the container. Field specs are exposed as attributes, so
    `spec.agents_view.shape` works like the reference's `obs_spec.agents_view`.
    """

    def __init__(self, constructor: Type, name: str = "", **field_specs: Any):
        self._constructor = constructor
        self._name = name
        self._field_specs = dict(field_specs)
        for key, value in field_specs.items():
            setattr(self, key, value)

    def generate_value(self) -> Any:
        return self._constructor(
            **{k: v.generate_value() for k, v in self._field_specs.items()}
        )

    def replace(self, **kwargs: Any) -> "TreeSpec":
        new_fields = {**self._field_specs, **kwargs}
        return TreeSpec(self._constructor, self._name, **new_fields)

    @property
    def fields(self) -> dict:
        return dict(self._field_specs)


def make_float_spec(shape: Sequence[int], name: str = "") -> Array:
    return Array(tuple(shape), jnp.float32, name)


def make_bool_spec(shape: Sequence[int], name: str = "") -> Array:
    return Array(tuple(shape), jnp.bool_, name)


def make_int_spec(shape: Sequence[int], name: str = "") -> Array:
    return Array(tuple(shape), jnp.int32, name)
