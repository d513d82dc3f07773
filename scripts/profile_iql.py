"""Decompose the rec-IQL fused step: act-scan vs train-scan vs full update_step.

rec-IQL's throughput convention is rollout_length=2 env steps then epochs=2 replay
train steps per update (reference `rec_iql.py` scan composition) — this script
measures where the milliseconds go on the real SMAX config so the "train-bound by
convention" claim in BASELINE.md is a measured statement (VERDICT r1 item 7).

All timings are whole compiled programs within ONE process (tunnel timings jitter
up to 2x across processes — CLAUDE.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mava_tpu import envs as environments
from mava_tpu.parallel import make_mesh, num_learner_devices
from mava_tpu.systems.q_learning import rec_iql
from mava_tpu.utils.config import load_config

NUM_ENVS = 64
SCAN_STEPS = 32  # updates per timed call (amortises dispatch)


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / n


def main():
    cfg = load_config(
        "default_rec_iql",
        [
            "env=smax",
            "env/scenario=2s3z",
            f"arch.num_envs={NUM_ENVS}",
            "logger.use_console=False",
        ],
    )
    mesh = make_mesh()
    cfg.arch.n_devices = num_learner_devices(mesh)
    cfg.system.scan_steps = SCAN_STEPS

    (env, _), q_net, opt, rb, state, _ = rec_iql.init(cfg, mesh)
    update = rec_iql.build_learn_fn(cfg, env, q_net, opt, rb, mesh, state.buffer_state)

    # Warm the buffer + compile the full program.
    state, _ = update(state)
    jax.block_until_ready(state)

    rollout, epochs = cfg.system.rollout_length, cfg.system.epochs
    env_steps_per_call = SCAN_STEPS * rollout * NUM_ENVS

    t_full = timeit(lambda s: update(s)[0], state)
    print(
        f"FULL update ({rollout} act + {epochs} train per step): "
        f"{t_full*1e3:8.2f} ms/call -> {env_steps_per_call/t_full:,.0f} env-steps/s",
        flush=True,
    )

    # Variants: act-only and train-only versions of the same scanned program.
    base_epochs, base_rollout = cfg.system.epochs, cfg.system.rollout_length

    cfg.system.epochs = 0
    act_only = rec_iql.build_learn_fn(
        cfg, env, q_net, opt, rb, mesh, state.buffer_state
    )
    t_act = timeit(lambda s: act_only(s)[0], state)
    cfg.system.epochs = base_epochs

    cfg.system.rollout_length = 0
    train_only = rec_iql.build_learn_fn(
        cfg, env, q_net, opt, rb, mesh, state.buffer_state
    )
    t_train = timeit(lambda s: train_only(s)[0], state)
    cfg.system.rollout_length = base_rollout

    print(f"act-only  ({base_rollout} steps): {t_act*1e3:8.2f} ms/call", flush=True)
    print(f"train-only ({base_epochs} epochs): {t_train*1e3:8.2f} ms/call", flush=True)
    print(
        f"split: act {t_act/t_full:5.1%}  train {t_train/t_full:5.1%} "
        f"(sum {100*(t_act+t_train)/t_full:.0f}% of full)",
        flush=True,
    )


if __name__ == "__main__":
    main()
