"""Decompose the ff-ISAC fused step: env/act cost vs per-epoch train cost.

SAC's convention is rollout_length=2 env steps then `epochs` gradient steps
per update (reference `ff_isac.py:471-488` composition). Rather than carving
the closure apart, this measures the full compiled update at several `epochs`
settings in ONE process and fits a line: the slope is the per-train-epoch
cost, the intercept is the act/env-side cost — turning BASELINE.md's
"act-bound by the algorithm's convention" claim into a measured statement
(VERDICT r1 item 7 / r2 next-4).

Usage: python scripts/profile_sac.py [timed_calls]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from mava_tpu.parallel import make_mesh, num_learner_devices
from mava_tpu.systems.sac import ff_isac
from mava_tpu.utils.config import load_config
from mava_tpu.utils.timestep_checker import check_total_timesteps

NUM_ENVS = 64
SCAN_STEPS = 32
EPOCH_GRID = (4, 8, 16, 32)


def build(epochs: int):
    cfg = load_config(
        "default_ff_isac",
        [
            "env=maswarm",
            f"arch.num_envs={NUM_ENVS}",
            f"system.epochs={epochs}",
            "logger.use_console=False",
        ],
    )
    mesh = make_mesh()
    cfg.arch.n_devices = num_learner_devices(mesh)
    cfg = check_total_timesteps(cfg)
    cfg.system.scan_steps = SCAN_STEPS

    explore, update, state = ff_isac.build_bench_learners(cfg, mesh)
    state, _ = explore(state)
    return update, state, cfg


def timed(update, state, n):
    state, _ = update(state)  # compile
    jax.block_until_ready(state)
    start = time.perf_counter()
    for _ in range(n):
        state, _ = update(state)
    jax.block_until_ready(state)
    return (time.perf_counter() - start) / n


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    rows = {}
    for epochs in EPOCH_GRID:
        update, state, cfg = build(epochs)
        dt = timed(update, state, n)
        env_steps = SCAN_STEPS * cfg.system.rollout_length * NUM_ENVS
        rows[epochs] = {
            "s_per_call": dt,
            "env_steps_per_s": round(env_steps / dt),
        }
        print(
            f"epochs={epochs}: {dt*1e3:.1f} ms/call, "
            f"{env_steps/dt:,.0f} env-steps/s",
            flush=True,
        )

    xs = np.array(EPOCH_GRID, dtype=np.float64)
    ys = np.array([rows[e]["s_per_call"] for e in EPOCH_GRID])
    slope, intercept = np.polyfit(xs, ys, 1)
    default_t = rows[32]["s_per_call"]
    train_frac = 32 * slope / default_t
    print(
        json.dumps(
            {
                "sac_epoch_rows": {str(k): v for k, v in rows.items()},
                "per_epoch_train_ms": round(slope * 1e3, 3),
                "act_side_ms": round(intercept * 1e3, 3),
                "train_fraction_at_default_epochs32": round(float(train_frac), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
