"""Actor / critic / Q networks, feedforward and recurrent.

Capability parity with reference `mava/networks.py:172-384`. The recurrent modules use a
GRU scanned over the time axis with carry reset on episode boundaries — the TPU-friendly
equivalent of sequence handling here is keeping the time axis inside `lax.scan` on-device
(SURVEY.md §5 long-context note).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.linen.initializers import orthogonal

from mava_tpu.distributions import MaskedEpsGreedy
from mava_tpu.types import (
    Observation,
    ObservationGlobalState,
    RNNGlobalObservation,
    RNNObservation,
)


class FeedForwardActor(nn.Module):
    """torso(agents_view) -> action_head(embedding, obs)."""

    torso: nn.Module
    action_head: nn.Module

    @nn.compact
    def __call__(self, observation: Observation):
        obs_embedding = self.torso(observation.agents_view)
        return self.action_head(obs_embedding, observation)


class FeedForwardValueNet(nn.Module):
    """V(obs); centralised variant consumes the global state (CTDE)."""

    torso: nn.Module
    centralised_critic: bool = False

    @nn.compact
    def __call__(
        self, observation: Union[Observation, ObservationGlobalState]
    ) -> jnp.ndarray:
        if self.centralised_critic:
            if not isinstance(observation, ObservationGlobalState):
                raise ValueError("Centralised critic requires a global state.")
            x = observation.global_state
        else:
            x = observation.agents_view
        x = self.torso(x)
        value = nn.Dense(1, kernel_init=orthogonal(1.0))(x)
        return jnp.squeeze(value, axis=-1)


class FeedForwardQNet(nn.Module):
    """Q(obs, action) for continuous control (reference `networks.py:210-235`)."""

    torso: nn.Module
    centralised_critic: bool = False

    @nn.compact
    def __call__(
        self,
        observation: Union[Observation, ObservationGlobalState],
        action: jnp.ndarray,
    ) -> jnp.ndarray:
        if self.centralised_critic:
            if not isinstance(observation, ObservationGlobalState):
                raise ValueError("Centralised critic requires a global state.")
            x = observation.global_state
        else:
            x = observation.agents_view
        x = jnp.concatenate([x, action], axis=-1)
        x = self.torso(x)
        q = nn.Dense(1, kernel_init=orthogonal(1.0))(x)
        return jnp.squeeze(q, axis=-1)


def _blockwise_orthogonal(key: jax.Array, shape: Sequence[int], dtype=jnp.float32):
    """Init a (h, 3h) recurrent kernel as 3 independent orthogonal (h, h) blocks.

    Matches `flax.linen.GRUCell`'s per-gate `recurrent_kernel_init=orthogonal()`
    exactly in distribution — a single orthogonal draw over the fused (h, 3h) shape
    would correlate the gate blocks instead.
    """
    h = shape[0]
    assert shape[1] == 3 * h, "fused recurrent kernel must be (h, 3h)"
    init = orthogonal()
    keys = jax.random.split(key, 3)
    return jnp.concatenate([init(k, (h, h), dtype) for k in keys], axis=-1)


class FusedGRUCell(nn.Module):
    """GRU cell with the 6 gate projections fused into 2 wide matmuls.

    Function-identical to `flax.linen.GRUCell` (reference `networks.py:238-266`
    uses the flax cell):

        r = sigmoid(x @ Wir + bir + h @ Whr)
        z = sigmoid(x @ Wiz + biz + h @ Whz)
        n = tanh(x @ Win + bin + r * (h @ Whn + bhn))
        h' = (1 - z) * n + z * h

    but issues the input projections as ONE (B, in) @ (in, 3h) matmul and the
    recurrent projections as ONE (B, h) @ (h, 3h) matmul instead of six separate
    Dense kernels. The rollout/BPTT scans are latency-bound, not flop-bound
    (docs/tpu_performance.md §7), so per-step kernel count is the cost that
    matters. Init distributions match flax per gate block (lecun-normal input
    kernels, orthogonal recurrent blocks, zero biases; only the `n` gate has a
    recurrent-side bias). Numerical equivalence to packed flax params is pinned
    in tests/test_recurrent.py.
    """

    @nn.compact
    def __call__(self, carry: jnp.ndarray, inputs: jnp.ndarray):
        h = carry
        hidden = h.shape[-1]
        w_i = self.param(
            "wi", nn.initializers.lecun_normal(), (inputs.shape[-1], 3 * hidden)
        )
        b_i = self.param("bi", nn.initializers.zeros_init(), (3 * hidden,))
        w_h = self.param("wh", _blockwise_orthogonal, (hidden, 3 * hidden))
        b_hn = self.param("bhn", nn.initializers.zeros_init(), (hidden,))

        gates_i = inputs @ w_i + b_i
        gates_h = h @ w_h
        xr, xz, xn = jnp.split(gates_i, 3, axis=-1)
        hr, hz, hn = jnp.split(gates_h, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * (hn + b_hn))
        new_h = (1.0 - z) * n + z * h
        return new_h, new_h


class ScannedRNN(nn.Module):
    """GRU scanned over the leading (time) axis with carry reset where `resets` is set.

    Input x is a tuple (inputs, resets): inputs (T, B, A, F), resets (T, B, A). The
    params are broadcast over time so one weight set serves the whole scan
    (reference `networks.py:238-266`).
    """

    hidden_state_dim: int = 128
    # When set, each step's output also includes its INPUT carry (pre-reset) — used
    # by the post-rollout batched critic pass to reconstruct the per-step hidden
    # states a fused in-rollout critic would have stored.
    collect_carries: bool = False

    @functools.partial(
        nn.scan,
        variable_broadcast="params",
        in_axes=0,
        out_axes=0,
        split_rngs={"params": False},
    )
    @nn.compact
    def __call__(
        self, carry: jnp.ndarray, x: Tuple[jnp.ndarray, jnp.ndarray]
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        ins, resets = x
        rnn_state = jnp.where(
            resets[..., jnp.newaxis],
            self.initialize_carry(ins.shape[:-1], self.hidden_state_dim),
            carry,
        )
        new_rnn_state, y = FusedGRUCell()(rnn_state, ins)
        if self.collect_carries:
            return new_rnn_state, (carry, y)
        return new_rnn_state, y

    @staticmethod
    def initialize_carry(batch_shape: Sequence[int], hidden_size: int) -> jnp.ndarray:
        return jnp.zeros((*batch_shape, hidden_size), dtype=jnp.float32)


class RecurrentActor(nn.Module):
    """pre_torso -> GRU -> post_torso -> action head."""

    pre_torso: nn.Module
    post_torso: nn.Module
    action_head: nn.Module
    hidden_state_dim: int = 128

    @nn.compact
    def __call__(
        self, policy_hidden_state: jnp.ndarray, observation_done: RNNObservation
    ):
        observation, done = observation_done
        embedding = self.pre_torso(observation.agents_view)
        policy_hidden_state, embedding = ScannedRNN(self.hidden_state_dim)(
            policy_hidden_state, (embedding, done)
        )
        embedding = self.post_torso(embedding)
        pi = self.action_head(embedding, observation)
        return policy_hidden_state, pi


class RecurrentValueNet(nn.Module):
    """Recurrent V(obs); centralised variant consumes the global state.

    With `collect_carries` the call also returns every step's input hidden state
    (pre-reset): `(final_hidden, (per_step_hidden, values))`. Parameters are
    identical either way, so the same params serve both call styles.
    """

    pre_torso: nn.Module
    post_torso: nn.Module
    centralised_critic: bool = False
    hidden_state_dim: int = 128
    collect_carries: bool = False

    @nn.compact
    def __call__(
        self,
        value_hidden_state: jnp.ndarray,
        observation_done: Union[RNNObservation, RNNGlobalObservation],
    ):
        observation, done = observation_done
        if self.centralised_critic:
            if not isinstance(observation, ObservationGlobalState):
                raise ValueError("Centralised critic requires a global state.")
            x = observation.global_state
        else:
            x = observation.agents_view
        embedding = self.pre_torso(x)
        value_hidden_state, rnn_out = ScannedRNN(
            self.hidden_state_dim, collect_carries=self.collect_carries
        )(value_hidden_state, (embedding, done))
        if self.collect_carries:
            carries, embedding = rnn_out
        else:
            embedding = rnn_out
        embedding = self.post_torso(embedding)
        value = nn.Dense(1, kernel_init=orthogonal(1.0))(embedding)
        value = jnp.squeeze(value, axis=-1)
        if self.collect_carries:
            return value_hidden_state, (carries, value)
        return value_hidden_state, value


class RecQNetwork(nn.Module):
    """Recurrent Q-network with eps-greedy distribution head
    (reference `networks.py:343-384`)."""

    pre_torso: nn.Module
    post_torso: nn.Module
    num_actions: int
    hidden_state_dim: int = 128

    @nn.compact
    def get_q_values(
        self, hidden_state: jnp.ndarray, observations_resets: RNNObservation
    ):
        obs, resets = observations_resets
        embedding = self.pre_torso(obs.agents_view)
        hidden_state, embedding = ScannedRNN(self.hidden_state_dim)(
            hidden_state, (embedding, resets)
        )
        embedding = self.post_torso(embedding)
        q_values = nn.Dense(self.num_actions, kernel_init=orthogonal(0.01))(embedding)
        return hidden_state, q_values

    def __call__(
        self,
        hidden_state: jnp.ndarray,
        observations_resets: RNNObservation,
        eps: float = 0.0,
    ):
        obs, _ = observations_resets
        hidden_state, q_values = self.get_q_values(hidden_state, observations_resets)
        return hidden_state, MaskedEpsGreedy(q_values, eps, obs.action_mask)
