"""Actor / critic / Q networks, feedforward and recurrent.

Capability parity with reference `mava/networks.py:172-384`. The recurrent modules use a
GRU scanned over the time axis with carry reset on episode boundaries — the TPU-friendly
equivalent of sequence handling here is keeping the time axis inside `lax.scan` on-device
(SURVEY.md §5 long-context note).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple, Union

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


# DEFAULT ScannedRNN implementation when a module is constructed without an
# explicit `gru_impl` (tests, ad-hoc notebooks). "auto" resolves to "pallas"
# on TPU — the measured winner on the full compiled rec-IPPO step (277k vs
# 202k steps/s vs "hoisted", scripts/profile_gru_ab.py, TPU v5 lite) — and
# "hoisted" elsewhere (off-TPU the Pallas kernel runs in interpret mode,
# which is only fit for tests). "hoisted" computes the input projection for
# ALL timesteps as one wide MXU matmul before the serial scan; "pallas"
# additionally runs the serial recurrence as ONE fused Pallas kernel
# (ops/pallas_gru.py — weights + carry resident in VMEM for all T steps);
# "cell" is the legacy per-step FusedGRUCell path (kept for A/B profiling —
# scripts/profile_gru_ab.py — and as the monkeypatch point for the flax
# variant). Equivalence is pinned in tests/test_recurrent.py and
# tests/test_pallas_gru.py.
#
# The SYSTEMS never mutate this: they resolve `network.gru_impl` from config
# at build time (against the mesh's device platform) and thread the concrete
# impl through network construction, so two systems with different impls
# coexist in one process (pinned in tests/test_recurrent.py).
GRU_IMPL = "auto"


def resolve_gru_impl(
    impl: Optional[str] = None, platform: Optional[str] = None
) -> str:
    """Resolve a gru_impl setting ("auto" picks per-backend) to a concrete one.

    `platform` is the device platform the network will actually run on (e.g.
    `mesh.devices.flat[0].platform` — how the systems call this at build time);
    without it, "auto" falls back to `jax.default_backend()` at call/trace
    time, i.e. it assumes the computation runs on the process's default
    backend. Code that explicitly jits/places a recurrent network on a
    non-default backend should pass `platform` (or a concrete impl) — the
    compiled (non-interpret) Pallas path does not lower on CPU.
    """
    impl = impl or GRU_IMPL
    if impl == "auto":
        platform = platform or jax.default_backend()
        return "pallas" if platform == "tpu" else "hoisted"
    return impl


class _CellScanRNN(nn.Module):
    """Legacy ScannedRNN body: nn.scan over a per-step GRU cell (6 or 2 matmul
    kernels per step depending on the cell). Superseded by the hoisted path in
    `ScannedRNN` but kept selectable via `GRU_IMPL = "cell"`."""

    hidden_state_dim: int = 128
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
            jnp.zeros((*ins.shape[:-1], self.hidden_state_dim), jnp.float32),
            carry,
        )
        new_rnn_state, y = FusedGRUCell()(rnn_state, ins)
        if self.collect_carries:
            return new_rnn_state, (carry, y)
        return new_rnn_state, y


class ScannedRNN(nn.Module):
    """GRU scanned over the leading (time) axis with carry reset where `resets` is set.

    Input x is a tuple (inputs, resets): inputs (T, B, A, F), resets (T, B, A). The
    params are broadcast over time so one weight set serves the whole scan
    (reference `networks.py:238-266`).

    TPU structure: the input-side gate projection has no serial dependency, so it
    is HOISTED out of the scan — one (T*B*A, F) @ (F, 3H) matmul feeds the whole
    sequence (large, batched, MXU-shaped) and the serial chain left inside
    `lax.scan` is only the recurrent h @ Wh matmul plus the gate arithmetic.
    The reference's flax GRUCell re-issues all six gate projections inside every
    scan step. Same math as FusedGRUCell (equivalence pinned in
    tests/test_recurrent.py); set `GRU_IMPL = "cell"` for the legacy body.
    """

    hidden_state_dim: int = 128
    # When set, each step's output also includes its INPUT carry (pre-reset) — used
    # by the post-rollout batched critic pass to reconstruct the per-step hidden
    # states a fused in-rollout critic would have stored.
    collect_carries: bool = False
    # Implementation selector, threaded from config by the systems (None falls
    # back to the module default GRU_IMPL so bare constructions keep working).
    gru_impl: Optional[str] = None

    @nn.compact
    def __call__(
        self, carry: jnp.ndarray, x: Tuple[jnp.ndarray, jnp.ndarray]
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        impl = resolve_gru_impl(self.gru_impl)
        if impl == "cell":
            return _CellScanRNN(self.hidden_state_dim, self.collect_carries)(carry, x)

        ins, resets = x
        hidden = self.hidden_state_dim
        w_i = self.param(
            "wi", nn.initializers.lecun_normal(), (ins.shape[-1], 3 * hidden)
        )
        b_i = self.param("bi", nn.initializers.zeros_init(), (3 * hidden,))
        w_h = self.param("wh", _blockwise_orthogonal, (hidden, 3 * hidden))
        b_hn = self.param("bhn", nn.initializers.zeros_init(), (hidden,))

        # One wide matmul for every timestep's input gates (T folds into batch).
        gates_i = ins @ w_i + b_i

        collect = self.collect_carries

        # The kernel pays off on real sequences (training/BPTT); T==1 calls
        # (the per-env-step rollout path) stay on the plain scan — one pallas
        # dispatch per rollout step would add latency where none is needed.
        if impl == "pallas" and ins.shape[0] > 1:
            from mava_tpu.ops.pallas_gru import gru_sequence

            t_len = ins.shape[0]
            lead = ins.shape[1:-1]  # e.g. (B, A)
            gi = gates_i.reshape(t_len, -1, 3 * hidden)
            # resets may carry fewer/singleton trailing dims than ins (rec-IQL
            # feeds (T, B, 1) against (T, B, A, F) inputs — the scan path
            # broadcasts it against the carry); expand to one flag per
            # flattened batch row before handing it to the kernel.
            keep_rows = jnp.broadcast_to(
                1.0 - resets.astype(jnp.float32)[..., jnp.newaxis],
                ins.shape[:-1] + (1,),
            ).reshape(t_len, -1, 1)
            keep = jnp.broadcast_to(keep_rows, gi.shape[:2] + (hidden,))
            h0 = carry.reshape(-1, hidden)
            hs = gru_sequence(gi, keep, h0, w_h, b_hn)
            final_h = hs[-1].reshape(*lead, hidden)
            ys = hs.reshape(t_len, *lead, hidden)
            if collect:
                carries = jnp.concatenate([h0[jnp.newaxis], hs[:-1]], axis=0)
                return final_h, (carries.reshape(t_len, *lead, hidden), ys)
            return final_h, ys

        def step(h_prev, inp):
            g_t, reset_t = inp
            h = jnp.where(reset_t[..., jnp.newaxis], 0.0, h_prev)
            xr, xz, xn = jnp.split(g_t, 3, axis=-1)
            hr, hz, hn = jnp.split(h @ w_h, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * (hn + b_hn))
            new_h = (1.0 - z) * n + z * h
            return new_h, ((h_prev, new_h) if collect else new_h)

        final_h, ys = jax.lax.scan(step, carry, (gates_i, resets))
        return final_h, ys

    @staticmethod
    def initialize_carry(batch_shape: Sequence[int], hidden_size: int) -> jnp.ndarray:
        return jnp.zeros((*batch_shape, hidden_size), dtype=jnp.float32)


class RecurrentActor(nn.Module):
    """pre_torso -> GRU -> post_torso -> action head."""

    pre_torso: nn.Module
    post_torso: nn.Module
    action_head: nn.Module
    hidden_state_dim: int = 128
    gru_impl: Optional[str] = None

    @nn.compact
    def __call__(
        self, policy_hidden_state: jnp.ndarray, observation_done: RNNObservation
    ):
        observation, done = observation_done
        embedding = self.pre_torso(observation.agents_view)
        policy_hidden_state, embedding = ScannedRNN(
            self.hidden_state_dim, gru_impl=self.gru_impl
        )(policy_hidden_state, (embedding, done))
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
    gru_impl: Optional[str] = None

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
            self.hidden_state_dim,
            collect_carries=self.collect_carries,
            gru_impl=self.gru_impl,
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
    gru_impl: Optional[str] = None

    @nn.compact
    def get_q_values(
        self, hidden_state: jnp.ndarray, observations_resets: RNNObservation
    ):
        obs, resets = observations_resets
        embedding = self.pre_torso(obs.agents_view)
        hidden_state, embedding = ScannedRNN(
            self.hidden_state_dim, gru_impl=self.gru_impl
        )(hidden_state, (embedding, resets))
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
