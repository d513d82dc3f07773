"""Episode rendering: turn env states into RGB frames / animated GIFs.

The reference gets rendering from its external env suites (Jumanji viewers —
its `examples/Quickstart.ipynb` ends by animating a trained RWARE episode via
`jumanji.make(...).render`); this framework ships native env engines, so it
ships the native viewers too. Pure numpy + PIL raster drawing (no matplotlib
dependency in the render path), one renderer per env family:

* grid worlds  — RWARE (shelves/goals/carriers), LBF (food levels),
  Cleaner (dirty mask), MaConnector (trails/targets)
* continuous   — SMAX (unit discs, hp ring, ally/enemy), MaSwarm
  (agents + landmarks)

Frames are plain `np.uint8 (H, W, 3)` arrays; `save_gif` writes an animated
GIF. `rollout_episode` drives ONE unbatched eval env on CPU with any act fn
(random, fresh, or checkpoint-restored policy — see `examples/render_episode.py`).
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Agent palette (distinct, colourblind-safe-ish).
AGENT_COLORS = [
    (31, 119, 180),
    (255, 127, 14),
    (44, 160, 44),
    (214, 39, 40),
    (148, 103, 189),
    (140, 86, 75),
    (227, 119, 194),
    (127, 127, 127),
    (188, 189, 34),
    (23, 190, 207),
]

BG = (250, 250, 250)
GRID_LINE = (225, 225, 225)


def unwrap_env(env: Any) -> Any:
    """Follow the wrapper chain to the base engine."""
    while hasattr(env, "_env"):
        env = env._env
    return env


def unwrap_state(state: Any) -> Any:
    """Follow wrapper states (e.g. RecordEpisodeMetricsState) to the base state."""
    while hasattr(state, "env_state"):
        state = state.env_state
    return state


def _canvas(rows: int, cols: int, scale: int):
    from PIL import Image, ImageDraw

    img = Image.new("RGB", (cols * scale, rows * scale), BG)
    draw = ImageDraw.Draw(img)
    for r in range(rows + 1):
        draw.line([(0, r * scale), (cols * scale, r * scale)], fill=GRID_LINE)
    for c in range(cols + 1):
        draw.line([(c * scale, 0), (c * scale, rows * scale)], fill=GRID_LINE)
    return img, draw


def _cell(draw, r: int, c: int, scale: int, color, inset: int = 1) -> None:
    draw.rectangle(
        [c * scale + inset, r * scale + inset,
         (c + 1) * scale - inset, (r + 1) * scale - inset],
        fill=color,
    )


def _disc(draw, r: float, c: float, scale: int, color, shrink: float = 0.12,
          outline=None) -> None:
    pad = scale * shrink
    draw.ellipse(
        [c * scale + pad, r * scale + pad,
         (c + 1) * scale - pad, (r + 1) * scale - pad],
        fill=color,
        outline=outline,
        width=2 if outline else 0,
    )


def _text(draw, r: float, c: float, scale: int, s: str, color=(255, 255, 255)):
    draw.text((c * scale + scale * 0.36, r * scale + scale * 0.22), s, fill=color)


def _render_rware(env: Any, state: Any, scale: int = 32) -> np.ndarray:
    img, draw = _canvas(env.height, env.width, scale)
    storage = np.asarray(env._storage_mask)
    goals = np.asarray(env._goals)
    shelf_pos = np.asarray(state.shelf_pos)
    requested = np.asarray(state.shelf_requested)
    agent_pos = np.asarray(state.agent_pos)
    carrying = np.asarray(state.agent_carrying)

    for r, c in np.argwhere(storage):
        _cell(draw, r, c, scale, (235, 235, 235))
    for r, c in goals:
        _cell(draw, r, c, scale, (180, 220, 180))
    # Shelves whose id is carried ride on the agent; draw them at shelf_pos anyway
    # (the engine keeps shelf_pos synced to the carrier's cell).
    for sid, (r, c) in enumerate(shelf_pos):
        color = (240, 150, 60) if requested[sid] else (120, 120, 130)
        _cell(draw, r, c, scale, color, inset=scale // 5)
    for aid, (r, c) in enumerate(agent_pos):
        _disc(draw, r, c, scale, AGENT_COLORS[aid % len(AGENT_COLORS)],
              outline=(60, 20, 90) if carrying[aid] >= 0 else None)
    return np.asarray(img)


def _render_lbf(env: Any, state: Any, scale: int = 32) -> np.ndarray:
    img, draw = _canvas(env.grid_size, env.grid_size, scale)
    food_pos = np.asarray(state.food_pos)
    food_level = np.asarray(state.food_level)
    eaten = np.asarray(state.food_eaten)
    agent_pos = np.asarray(state.agent_pos)
    agent_level = np.asarray(state.agent_level)

    for fid, (r, c) in enumerate(food_pos):
        if eaten[fid]:
            continue
        _disc(draw, r, c, scale, (80, 160, 60), shrink=0.2)
        _text(draw, r, c, scale, str(int(food_level[fid])))
    for aid, (r, c) in enumerate(agent_pos):
        _disc(draw, r, c, scale, AGENT_COLORS[aid % len(AGENT_COLORS)])
        _text(draw, r, c, scale, str(int(agent_level[aid])))
    return np.asarray(img)


def _render_cleaner(env: Any, state: Any, scale: int = 32) -> np.ndarray:
    img, draw = _canvas(env.num_rows, env.num_cols, scale)
    dirty = np.asarray(state.dirty)
    for r, c in np.argwhere(dirty):
        _cell(draw, r, c, scale, (150, 110, 70))
    for aid, (r, c) in enumerate(np.asarray(state.agent_pos)):
        _disc(draw, r, c, scale, AGENT_COLORS[aid % len(AGENT_COLORS)])
    return np.asarray(img)


def _render_connector(env: Any, state: Any, scale: int = 32) -> np.ndarray:
    img, draw = _canvas(env.grid_size, env.grid_size, scale)
    for r, c in np.argwhere(np.asarray(state.paths)):
        _cell(draw, r, c, scale, (205, 205, 215))
    connected = np.asarray(state.connected)
    for aid, (r, c) in enumerate(np.asarray(state.target_pos)):
        color = AGENT_COLORS[aid % len(AGENT_COLORS)]
        _cell(draw, r, c, scale, tuple(min(255, v + 80) for v in color),
              inset=scale // 4)
    for aid, (r, c) in enumerate(np.asarray(state.head_pos)):
        _disc(draw, r, c, scale, AGENT_COLORS[aid % len(AGENT_COLORS)],
              outline=(30, 120, 30) if connected[aid] else None)
    return np.asarray(img)


def _render_smax(env: Any, state: Any, scale: int = 18) -> np.ndarray:
    from mava_tpu.envs.smax import MAP_HEIGHT, MAP_WIDTH

    img, draw = _canvas(int(MAP_HEIGHT), int(MAP_WIDTH), scale)
    pos = np.asarray(state.unit_pos)  # (N, 2) as (x, y)
    hp = np.asarray(state.unit_hp)
    max_hp = np.asarray(env._stats[np.asarray(state.unit_types), 0])
    n_allies = env.num_agents
    for i in range(pos.shape[0]):
        if hp[i] <= 0:
            continue
        x, y = pos[i]
        ally = i < n_allies
        frac = float(np.clip(hp[i] / max(max_hp[i], 1e-6), 0.0, 1.0))
        base = (40, 90, 200) if ally else (200, 60, 50)
        color = tuple(int(v * (0.45 + 0.55 * frac)) for v in base)
        # y grows upward in SMAX; image rows grow downward.
        _disc(draw, MAP_HEIGHT - 1 - y, x, scale, color,
              outline=(20, 20, 20) if ally else None)
    return np.asarray(img)


def _render_maswarm(env: Any, state: Any, scale: int = 60) -> np.ndarray:
    # Positions live roughly in [-1.5, 1.5]^2 — map to a 10x10 cell canvas.
    cells, lo, hi = 10, -1.5, 1.5
    img, draw = _canvas(cells, cells, scale)

    def to_cell(p):
        return (np.clip((p - lo) / (hi - lo), 0, 0.999) * cells)

    for r, c in [to_cell(np.asarray(p))[::-1] for p in np.asarray(state.landmarks)]:
        _disc(draw, r - 0.5, c - 0.5, scale, (120, 170, 120), shrink=0.33)
    for aid, p in enumerate(np.asarray(state.pos)):
        cy, cx = to_cell(np.asarray(p))[::-1]
        _disc(draw, cy - 0.5, cx - 0.5, scale,
              AGENT_COLORS[aid % len(AGENT_COLORS)], shrink=0.28)
    return np.asarray(img)


_RENDERERS = {
    "RobotWarehouse": _render_rware,
    "LevelBasedForaging": _render_lbf,
    "Cleaner": _render_cleaner,
    "MaConnector": _render_connector,
    "Smax": _render_smax,
    "MaSwarm": _render_maswarm,
}


def render_frame(env: Any, state: Any) -> np.ndarray:
    """Render one env state to an RGB uint8 frame. Raises KeyError for env
    families without a registered viewer (articulated/gigastep/matrax)."""
    base_env = unwrap_env(env)
    name = type(base_env).__name__
    if name not in _RENDERERS:
        raise KeyError(
            f"no renderer registered for {name!r} "
            f"(available: {sorted(_RENDERERS)})"
        )
    return _RENDERERS[name](base_env, unwrap_state(state))


def rollout_episode(
    env: Any,
    act_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    key: jnp.ndarray,
    max_steps: Optional[int] = None,
) -> Tuple[List[np.ndarray], float]:
    """Roll out ONE unbatched episode, rendering every state.

    `act_fn(timestep, key) -> (A,) actions`. Returns (frames, episode_return).
    Plain python loop — this is a viewer, not a training path.
    """
    max_steps = max_steps or getattr(unwrap_env(env), "time_limit", 200)
    state, timestep = env.reset(key)
    frames = [render_frame(env, state)]
    total = 0.0
    for _ in range(max_steps):
        key, act_key = jax.random.split(key)
        action = act_fn(timestep, act_key)
        state, timestep = env.step(state, action)
        frames.append(render_frame(env, state))
        total += float(np.asarray(timestep.reward).mean())
        if bool(np.asarray(timestep.last())):
            break
    return frames, total


def save_gif(frames: List[np.ndarray], path: str, fps: int = 8) -> str:
    from PIL import Image

    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(
        path,
        save_all=True,
        append_images=imgs[1:],
        duration=int(1000 / fps),
        loop=0,
    )
    return path
