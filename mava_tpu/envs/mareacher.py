"""MaReacher: multi-agent articulated-arm control with exact Lagrangian dynamics.

The reference's continuous-control benchmark is MaBrax — MuJoCo robots whose joints
are factorized across agents (ant_4x2, halfcheetah_6x1; reference
`mava/wrappers/jaxmarl.py:376-405`). brax/mujoco are not in this image, so this env
supplies the same capability natively: a planar N-link manipulator whose JOINTS are
split across agents (reacher_2x1 = 2 agents x 1 joint, reacher_3x2 = 3 agents x 2
joints, ...), with full rigid-body dynamics — not point-mass physics.

The dynamics are EXACT equations of motion for a planar revolute chain with point
masses, derived from the kinematics by automatic differentiation (the TPU-idiomatic
formulation — no hand-rolled recursive Newton-Euler, no scatters):

    T(q, q̇) = ½ Σₖ mₖ |∂pₖ/∂q · q̇|²          (kinetic energy from the FK Jacobian)
    M(q)     = ∂²T/∂q̇²                        (mass matrix via jax.hessian)
    C(q,q̇)q̇ = ∂(M q̇)/∂q · q̇                  (Coriolis/centrifugal via jax.jacfwd)
    M q̈      = τ − C q̇ + ∂(T−V)/∂q − β q̇      (Euler-Lagrange, solved with
                                               jnp.linalg.solve on the tiny N×N M)

Integration is classic RK4 with substeps (see _integrate for why symplectic Euler was rejected). Everything is a few
small dense ops — vmapped over envs it compiles to batched matmuls.

Task: cooperative reaching. Each agent torques its own joints; the shared team
reward is -|fingertip - target| - ctrl_cost·Σa² (classic reacher shaping). Episodes
truncate at time_limit; the target resamples on reset. With `gravity` set, the arm
must also fight gravity (harder: the ISAC/MASAC stress configuration).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from mava_tpu import specs
from mava_tpu.types import Observation, PRNGKey, StepType, TimeStep, restart

_DT = 0.05
_SUBSTEPS = 4
_DAMPING = 0.5
_TORQUE_SCALE = 1.0
_MAX_SPEED = 20.0  # rad/s safety clip; unreachable in normal play (torque<=1, damping)
_CTRL_COST = 0.05


@struct.dataclass
class MaReacherState:
    key: PRNGKey
    step_count: jnp.ndarray
    q: jnp.ndarray  # (J,) joint angles
    qd: jnp.ndarray  # (J,) joint velocities
    target: jnp.ndarray  # (2,)


class MaReacher:
    """Planar N-link arm, joints factorized across agents (MaBrax-style)."""

    def __init__(
        self,
        num_agents: int = 2,
        joints_per_agent: int = 1,
        time_limit: int = 100,
        gravity: float = 0.0,
        torque_scale: float = _TORQUE_SCALE,
    ):
        self.num_agents = num_agents
        self.joints_per_agent = joints_per_agent
        self.num_joints = num_agents * joints_per_agent
        self.time_limit = time_limit
        self.gravity = float(gravity)
        self.torque_scale = float(torque_scale)
        self.action_dim = joints_per_agent

        # Uniform chain: total reach 1.0, equal point masses summing to 1.
        self.link_lengths = jnp.full(self.num_joints, 1.0 / self.num_joints)
        self.masses = jnp.full(self.num_joints, 1.0 / self.num_joints)

        # own joints (cos, sin, vel) + fingertip(2) + target(2) + tip-to-target(2)
        self.num_obs_features = 3 * joints_per_agent + 6

    # ------------------------------------------------------------- kinematics
    def _mass_positions(self, q: jnp.ndarray) -> jnp.ndarray:
        """(J, 2) world positions of the point mass at each link end."""
        phi = jnp.cumsum(q)
        steps = self.link_lengths[:, None] * jnp.stack(
            [jnp.cos(phi), jnp.sin(phi)], axis=-1
        )
        return jnp.cumsum(steps, axis=0)

    def _fingertip(self, q: jnp.ndarray) -> jnp.ndarray:
        return self._mass_positions(q)[-1]

    # --------------------------------------------------------------- dynamics
    def _kinetic(self, q: jnp.ndarray, qd: jnp.ndarray) -> jnp.ndarray:
        vel = jax.jvp(self._mass_positions, (q,), (qd,))[1]  # (J, 2) mass velocities
        return 0.5 * jnp.sum(self.masses[:, None] * vel**2)

    def _potential(self, q: jnp.ndarray) -> jnp.ndarray:
        heights = self._mass_positions(q)[:, 1]
        return self.gravity * jnp.sum(self.masses * heights)

    def mass_matrix(self, q: jnp.ndarray) -> jnp.ndarray:
        """M(q) = ∂²T/∂q̇² — symmetric positive definite (J, J)."""
        return jax.hessian(self._kinetic, argnums=1)(q, jnp.zeros_like(q))

    def _accel(self, q: jnp.ndarray, qd: jnp.ndarray, tau: jnp.ndarray) -> jnp.ndarray:
        """Solve the Euler-Lagrange equation for q̈."""
        M = self.mass_matrix(q)
        momentum = lambda q_: jax.grad(self._kinetic, argnums=1)(q_, qd)  # M(q_)·q̇
        coriolis = jax.jacfwd(momentum)(q) @ qd
        dL_dq = jax.grad(lambda q_: self._kinetic(q_, qd) - self._potential(q_))(q)
        rhs = tau - coriolis + dL_dq - _DAMPING * qd
        return jnp.linalg.solve(M, rhs)

    def _integrate(self, q: jnp.ndarray, qd: jnp.ndarray, tau: jnp.ndarray):
        """Classic RK4 on the coupled (q, q̇) ODE, _SUBSTEPS per env step. The mass
        matrix M(q) makes the Hamiltonian non-separable, so symplectic Euler loses
        its energy guarantee here — RK4's O(h⁴) error conserves energy to <1% over
        hundreds of steps (tested) at 4 accel evals per substep (tiny dense ops)."""
        h = _DT / _SUBSTEPS

        def deriv(state):
            q, qd = state
            return qd, self._accel(q, qd, tau)

        def sub(carry, _):
            q, qd = carry
            k1 = deriv((q, qd))
            k2 = deriv((q + 0.5 * h * k1[0], qd + 0.5 * h * k1[1]))
            k3 = deriv((q + 0.5 * h * k2[0], qd + 0.5 * h * k2[1]))
            k4 = deriv((q + h * k3[0], qd + h * k3[1]))
            q = q + (h / 6.0) * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0])
            qd = qd + (h / 6.0) * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1])
            qd = jnp.clip(qd, -_MAX_SPEED, _MAX_SPEED)
            return (q, qd), None

        (q, qd), _ = jax.lax.scan(sub, (q, qd), None, _SUBSTEPS)
        # Wrap angles to keep cos/sin observations well-conditioned forever
        # (positions/energies are invariant to 2π shifts).
        q = jnp.mod(q + jnp.pi, 2 * jnp.pi) - jnp.pi
        return q, qd

    # -------------------------------------------------------------------- API
    def _observe(self, state: MaReacherState) -> Observation:
        a, jpa = self.num_agents, self.joints_per_agent
        q_own = state.q.reshape(a, jpa)
        qd_own = state.qd.reshape(a, jpa)
        tip = self._fingertip(state.q)
        shared = jnp.concatenate([tip, state.target, state.target - tip])
        agents_view = jnp.concatenate(
            [
                jnp.cos(q_own),
                jnp.sin(q_own),
                qd_own / _MAX_SPEED,
                jnp.broadcast_to(shared, (a, 6)),
            ],
            axis=-1,
        ).astype(jnp.float32)
        mask = jnp.ones((a, self.action_dim), dtype=jnp.bool_)
        return Observation(agents_view, mask, jnp.repeat(state.step_count, a))

    def _reward(self, state: MaReacherState, action: jnp.ndarray) -> jnp.ndarray:
        dist = jnp.linalg.norm(self._fingertip(state.q) - state.target)
        ctrl = _CTRL_COST * jnp.sum(action**2)
        team = (-dist - ctrl).astype(jnp.float32)
        return jnp.repeat(team, self.num_agents)

    def reset(self, key: PRNGKey) -> Tuple[MaReacherState, TimeStep]:
        key, q_key, t_key = jax.random.split(key, 3)
        q = jax.random.uniform(
            q_key, (self.num_joints,), minval=-jnp.pi, maxval=jnp.pi
        )
        # Target in a reachable annulus (reach = 1.0).
        r_key, a_key = jax.random.split(t_key)
        radius = jax.random.uniform(r_key, (), minval=0.2, maxval=0.9)
        angle = jax.random.uniform(a_key, (), minval=-jnp.pi, maxval=jnp.pi)
        target = radius * jnp.stack([jnp.cos(angle), jnp.sin(angle)])
        state = MaReacherState(
            key=key,
            step_count=jnp.int32(0),
            q=q,
            qd=jnp.zeros(self.num_joints),
            target=target,
        )
        return state, restart(self._observe(state), {}, self.num_agents)

    def step(
        self, state: MaReacherState, action: jnp.ndarray
    ) -> Tuple[MaReacherState, TimeStep]:
        action = jnp.clip(action, -1.0, 1.0)  # (A, jpa)
        tau = action.reshape(self.num_joints) * self.torque_scale
        q, qd = self._integrate(state.q, state.qd, tau)

        step_count = state.step_count + 1
        new_state = MaReacherState(
            key=state.key,
            step_count=step_count,
            q=q,
            qd=qd,
            target=state.target,
        )
        reward = self._reward(new_state, action)
        obs = self._observe(new_state)
        time_up = step_count >= self.time_limit
        timestep = TimeStep(
            step_type=jnp.where(
                time_up, jnp.int32(StepType.LAST), jnp.int32(StepType.MID)
            ),
            reward=reward,
            discount=jnp.ones(self.num_agents, dtype=jnp.float32),
            observation=obs,
            extras={},
        )
        return new_state, timestep

    def observation_spec(self) -> specs.TreeSpec:
        return specs.TreeSpec(
            Observation,
            "ObservationSpec",
            agents_view=specs.Array(
                (self.num_agents, self.num_obs_features), jnp.float32, "agents_view"
            ),
            action_mask=specs.Array(
                (self.num_agents, self.action_dim), jnp.bool_, "action_mask"
            ),
            step_count=specs.BoundedArray(
                (self.num_agents,),
                jnp.int32,
                "step_count",
                minimum=0,
                maximum=self.time_limit,
            ),
        )

    def action_spec(self) -> specs.BoundedArray:
        return specs.BoundedArray(
            (self.num_agents, self.action_dim),
            jnp.float32,
            "action",
            minimum=-1.0,
            maximum=1.0,
        )

    def reward_spec(self) -> specs.Array:
        return specs.Array((self.num_agents,), jnp.float32, "reward")

    @property
    def unwrapped(self) -> "MaReacher":
        return self
