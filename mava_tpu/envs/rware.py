"""RobotWarehouse (RWARE), implemented natively in JAX.

The reference wraps Jumanji's RobotWarehouse (`mava/wrappers/jumanji.py:128-155`); that
dependency does not exist in this image, so the environment itself is reimplemented here
from the published RWARE rules, with the Jumanji variant's semantics:

  * grid layout parameterised by (shelf_rows, shelf_columns, column_height), goals at the
    bottom-centre, highway aisles between shelf blocks;
  * actions per agent: 0=noop, 1=forward, 2=turn-left, 3=turn-right, 4=toggle-load;
  * a request queue of `request_queue_size` shelves; delivering a requested shelf to a
    goal yields +1 team reward and a new (distinct) shelf is requested;
  * agents carrying a shelf cannot move through occupied storage cells; unloaded agents
    can pass under shelves;
  * **episodes terminate on agent collision** (two agents in the same cell after a step,
    or a pass-through swap) — the harder Jumanji variant (see reference
    `docs/jumanji_rware_comparison.md`);
  * observation per agent: own (y, x, carrying) plus a (2r+1)^2 window with 7 features
    per cell [agent present, direction one-hot(4), shelf present, shelf requested] —
    66 features at sensor_range=1, float32;
  * rewards/discounts are already per-agent (the repetition the reference applies in
    `RwareWrapper.modify_timestep`, `mava/wrappers/jumanji.py:135-144`).

Everything is static-shape and vmap/scan-friendly: grids are rebuilt each step with
scatters, windows gathered with dynamic slices.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mava_tpu import specs
from mava_tpu.types import (
    Observation,
    PRNGKey,
    TimeStep,
    restart,
    termination,
    transition,
    truncation,
)

# Direction encoding: 0=up, 1=right, 2=down, 3=left (clockwise).
_DIR_VECS = np.array([[-1, 0], [0, 1], [1, 0], [0, -1]], dtype=np.int32)

NOOP, FORWARD, LEFT, RIGHT, TOGGLE = 0, 1, 2, 3, 4
NUM_ACTIONS = 5


@struct.dataclass
class RwareState:
    key: PRNGKey
    step_count: jnp.ndarray  # () int32
    agent_pos: jnp.ndarray  # (A, 2) int32
    agent_dir: jnp.ndarray  # (A,) int32
    agent_carrying: jnp.ndarray  # (A,) int32, shelf id or -1
    shelf_pos: jnp.ndarray  # (S, 2) int32
    shelf_requested: jnp.ndarray  # (S,) bool


def _build_layout(
    shelf_rows: int, shelf_columns: int, column_height: int
) -> Tuple[np.ndarray, np.ndarray, Tuple[int, int]]:
    """Returns (storage_mask (H,W), goals (2,2) as (row, col), (H, W))."""
    height = (column_height + 1) * shelf_rows + 2
    width = 3 * shelf_columns + 1
    goals = np.array(
        [[height - 1, width // 2 - 1], [height - 1, width // 2]], dtype=np.int32
    )

    ys, xs = np.mgrid[0:height, 0:width]
    highway = (
        (xs % 3 == 0)
        | (ys % (column_height + 1) == 0)
        | (ys == height - 1)
        | (
            (ys > height - (column_height + 3))
            & ((xs == goals[0, 1]) | (xs == goals[1, 1]))
        )
    )
    storage_mask = ~highway
    return storage_mask, goals, (height, width)


class RobotWarehouse:
    """TPU-native RWARE. All methods are pure and jittable."""

    def __init__(
        self,
        shelf_rows: int = 1,
        shelf_columns: int = 3,
        column_height: int = 8,
        num_agents: int = 2,
        sensor_range: int = 1,
        request_queue_size: int = 2,
        time_limit: int = 500,
    ):
        storage_mask, goals, (height, width) = _build_layout(
            shelf_rows, shelf_columns, column_height
        )
        self.height, self.width = height, width
        self.num_agents = num_agents
        self.sensor_range = sensor_range
        self.request_queue_size = request_queue_size
        self.time_limit = time_limit
        self.action_dim = NUM_ACTIONS

        self._storage_mask = jnp.asarray(storage_mask)
        self._goals = jnp.asarray(goals)
        # Initial shelf positions: every storage cell holds a shelf.
        shelf_cells = np.argwhere(storage_mask).astype(np.int32)
        self.num_shelves = int(shelf_cells.shape[0])
        self._init_shelf_pos = jnp.asarray(shelf_cells)

        self._goal_grid = jnp.zeros((height, width), dtype=jnp.bool_)
        self._goal_grid = self._goal_grid.at[goals[:, 0], goals[:, 1]].set(True)

        window = 2 * sensor_range + 1
        self.num_obs_features = 3 + window * window * 7

    # ------------------------------------------------------------------ helpers
    def _shelf_grid(self, shelf_pos: jnp.ndarray) -> jnp.ndarray:
        """(H, W) int32: shelf id + 1 at the shelf's cell, 0 elsewhere."""
        grid = jnp.zeros((self.height, self.width), dtype=jnp.int32)
        ids = jnp.arange(self.num_shelves, dtype=jnp.int32) + 1
        return grid.at[shelf_pos[:, 0], shelf_pos[:, 1]].set(ids)

    def _observe(self, state: RwareState) -> Observation:
        a = self.num_agents
        r = self.sensor_range
        window = 2 * r + 1

        shelf_grid = self._shelf_grid(state.shelf_pos)
        requested_grid = jnp.zeros((self.height, self.width), dtype=jnp.float32)
        requested_grid = requested_grid.at[
            state.shelf_pos[:, 0], state.shelf_pos[:, 1]
        ].set(state.shelf_requested.astype(jnp.float32))

        agent_grid = jnp.zeros((self.height, self.width), dtype=jnp.float32)
        agent_grid = agent_grid.at[state.agent_pos[:, 0], state.agent_pos[:, 1]].set(
            1.0
        )
        dir_grid = jnp.zeros((self.height, self.width), dtype=jnp.int32)
        dir_grid = dir_grid.at[state.agent_pos[:, 0], state.agent_pos[:, 1]].set(
            state.agent_dir + 1
        )

        # Stack per-cell feature planes: [agent, dir(4 one-hot), shelf, requested].
        dir_onehot = jax.nn.one_hot(dir_grid - 1, 4, dtype=jnp.float32) * agent_grid[
            ..., None
        ]
        planes = jnp.concatenate(
            [
                agent_grid[..., None],
                dir_onehot,
                (shelf_grid > 0).astype(jnp.float32)[..., None],
                requested_grid[..., None],
            ],
            axis=-1,
        )  # (H, W, 7)
        padded = jnp.pad(planes, ((r, r), (r, r), (0, 0)))

        def crop(pos: jnp.ndarray) -> jnp.ndarray:
            return jax.lax.dynamic_slice(
                padded, (pos[0], pos[1], 0), (window, window, 7)
            ).reshape(-1)

        windows = jax.vmap(crop)(state.agent_pos)  # (A, window*window*7)

        own = jnp.concatenate(
            [
                state.agent_pos.astype(jnp.float32),
                (state.agent_carrying >= 0).astype(jnp.float32)[:, None],
            ],
            axis=-1,
        )  # (A, 3)
        agents_view = jnp.concatenate([own, windows], axis=-1)

        action_mask = self._action_mask(state, shelf_grid)
        step_count = jnp.repeat(state.step_count, a)
        return Observation(agents_view, action_mask, step_count)

    def _action_mask(
        self, state: RwareState, shelf_grid: jnp.ndarray
    ) -> jnp.ndarray:
        target = state.agent_pos + _DIR_VECS_J[state.agent_dir]
        in_bounds = (
            (target[:, 0] >= 0)
            & (target[:, 0] < self.height)
            & (target[:, 1] >= 0)
            & (target[:, 1] < self.width)
        )
        safe_target = jnp.clip(
            target,
            0,
            jnp.array([self.height - 1, self.width - 1], dtype=jnp.int32),
        )
        shelf_at_target = shelf_grid[safe_target[:, 0], safe_target[:, 1]] > 0
        carrying = state.agent_carrying >= 0
        fwd_ok = in_bounds & ~(carrying & shelf_at_target)

        shelf_here = (
            shelf_grid[state.agent_pos[:, 0], state.agent_pos[:, 1]] > 0
        )
        on_storage = self._storage_mask[state.agent_pos[:, 0], state.agent_pos[:, 1]]
        toggle_ok = jnp.where(carrying, on_storage, shelf_here)

        ones = jnp.ones_like(fwd_ok)
        return jnp.stack([ones, fwd_ok, ones, ones, toggle_ok], axis=-1)

    # ------------------------------------------------------------------ API
    def reset(self, key: PRNGKey) -> Tuple[RwareState, TimeStep]:
        key, pos_key, dir_key, req_key = jax.random.split(key, 4)

        n_cells = self.height * self.width
        cells = jax.random.choice(
            pos_key, n_cells, shape=(self.num_agents,), replace=False
        )
        agent_pos = jnp.stack([cells // self.width, cells % self.width], axis=-1)
        agent_pos = agent_pos.astype(jnp.int32)
        agent_dir = jax.random.randint(dir_key, (self.num_agents,), 0, 4)

        requested_ids = jax.random.choice(
            req_key,
            self.num_shelves,
            shape=(self.request_queue_size,),
            replace=False,
        )
        shelf_requested = (
            jnp.zeros(self.num_shelves, dtype=jnp.bool_).at[requested_ids].set(True)
        )

        state = RwareState(
            key=key,
            step_count=jnp.int32(0),
            agent_pos=agent_pos,
            agent_dir=agent_dir.astype(jnp.int32),
            agent_carrying=jnp.full(self.num_agents, -1, dtype=jnp.int32),
            shelf_pos=self._init_shelf_pos,
            shelf_requested=shelf_requested,
        )
        return state, restart(self._observe(state), {}, self.num_agents)

    def step(
        self, state: RwareState, action: jnp.ndarray
    ) -> Tuple[RwareState, TimeStep]:
        action = action.astype(jnp.int32)
        shelf_grid = self._shelf_grid(state.shelf_pos)
        carrying = state.agent_carrying >= 0

        # --- movement ---------------------------------------------------------
        fwd = state.agent_pos + _DIR_VECS_J[state.agent_dir]
        in_bounds = (
            (fwd[:, 0] >= 0)
            & (fwd[:, 0] < self.height)
            & (fwd[:, 1] >= 0)
            & (fwd[:, 1] < self.width)
        )
        safe_fwd = jnp.clip(
            fwd, 0, jnp.array([self.height - 1, self.width - 1], dtype=jnp.int32)
        )
        shelf_at_fwd = shelf_grid[safe_fwd[:, 0], safe_fwd[:, 1]] > 0
        can_move = in_bounds & ~(carrying & shelf_at_fwd)
        moves = (action == FORWARD) & can_move
        new_pos = jnp.where(moves[:, None], safe_fwd, state.agent_pos)

        new_dir = state.agent_dir
        new_dir = jnp.where(action == LEFT, (new_dir - 1) % 4, new_dir)
        new_dir = jnp.where(action == RIGHT, (new_dir + 1) % 4, new_dir)

        # --- collision detection (episode terminates) --------------------------
        flat_new = new_pos[:, 0] * self.width + new_pos[:, 1]
        same_cell = (flat_new[:, None] == flat_new[None, :]) & ~jnp.eye(
            self.num_agents, dtype=jnp.bool_
        )
        flat_old = state.agent_pos[:, 0] * self.width + state.agent_pos[:, 1]
        swap = (
            (flat_new[:, None] == flat_old[None, :])
            & (flat_old[:, None] == flat_new[None, :])
            & ~jnp.eye(self.num_agents, dtype=jnp.bool_)
        )
        collision = jnp.any(same_cell) | jnp.any(swap)

        # Carried shelves travel with their agent: scatter the new position into the
        # carried shelf's row. Non-carrying / non-moving agents write to a padding row.
        carried_id = jnp.clip(state.agent_carrying, 0, self.num_shelves - 1)
        update_rows = jnp.where(carrying & moves, carried_id, self.num_shelves)
        shelf_pos_padded = jnp.concatenate(
            [state.shelf_pos, jnp.zeros((1, 2), dtype=jnp.int32)], axis=0
        )
        shelf_pos_padded = shelf_pos_padded.at[update_rows].set(new_pos)
        shelf_pos = shelf_pos_padded[: self.num_shelves]

        # --- toggle load/unload -------------------------------------------------
        shelf_grid_after = self._shelf_grid(shelf_pos)
        shelf_here = shelf_grid_after[new_pos[:, 0], new_pos[:, 1]]  # id+1 or 0
        on_storage = self._storage_mask[new_pos[:, 0], new_pos[:, 1]]
        toggles = action == TOGGLE

        pickup = toggles & ~carrying & (shelf_here > 0)
        drop = toggles & carrying & on_storage
        new_carrying = jnp.where(pickup, shelf_here - 1, state.agent_carrying)
        new_carrying = jnp.where(drop, -1, new_carrying)

        # --- deliveries (sequential over agents for distinct new requests) -----
        at_goal = self._goal_grid[new_pos[:, 0], new_pos[:, 1]]
        key = state.key

        def deliver_one(i, carry):
            requested, key, reward = carry
            sid = jnp.clip(new_carrying[i], 0, self.num_shelves - 1)
            do = (new_carrying[i] >= 0) & requested[sid] & at_goal[i]
            key, sub = jax.random.split(key)
            # New request: uniform over currently-unrequested shelves (the delivered
            # shelf is still marked requested here, so it is excluded).
            logits = jnp.where(~requested, 0.0, -jnp.inf)
            new_req = jax.random.categorical(sub, logits)
            requested = jnp.where(
                do, requested.at[new_req].set(True).at[sid].set(False), requested
            )
            reward = reward + do.astype(jnp.float32)
            return requested, key, reward

        requested, key, team_reward = jax.lax.fori_loop(
            0,
            self.num_agents,
            deliver_one,
            (state.shelf_requested, key, jnp.float32(0.0)),
        )

        # --- bookkeeping --------------------------------------------------------
        step_count = state.step_count + 1
        new_state = RwareState(
            key=key,
            step_count=step_count,
            agent_pos=new_pos,
            agent_dir=new_dir,
            agent_carrying=new_carrying,
            shelf_pos=shelf_pos,
            shelf_requested=requested,
        )
        obs = self._observe(new_state)
        reward = jnp.repeat(team_reward, self.num_agents)

        time_up = step_count >= self.time_limit
        timestep = jax.lax.cond(
            collision,
            lambda: termination(reward, obs, {}, self.num_agents),
            lambda: jax.lax.cond(
                time_up,
                lambda: truncation(reward, obs, {}, self.num_agents),
                lambda: transition(reward, obs, {}, self.num_agents),
            ),
        )
        return new_state, timestep

    # ------------------------------------------------------------------ specs
    def observation_spec(self) -> specs.TreeSpec:
        return specs.TreeSpec(
            Observation,
            "ObservationSpec",
            agents_view=specs.Array(
                (self.num_agents, self.num_obs_features), jnp.float32, "agents_view"
            ),
            action_mask=specs.Array(
                (self.num_agents, NUM_ACTIONS), jnp.bool_, "action_mask"
            ),
            step_count=specs.BoundedArray(
                (self.num_agents,),
                jnp.int32,
                "step_count",
                minimum=0,
                maximum=self.time_limit,
            ),
        )

    def action_spec(self) -> specs.DiscreteArray:
        return specs.DiscreteArray(
            (self.num_agents,), jnp.int32, "action", num_values=NUM_ACTIONS
        )

    def reward_spec(self) -> specs.Array:
        return specs.Array((self.num_agents,), jnp.float32, "reward")

    @property
    def unwrapped(self) -> "RobotWarehouse":
        return self


_DIR_VECS_J = jnp.asarray(_DIR_VECS)
