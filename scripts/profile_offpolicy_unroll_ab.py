"""A/B act-scan unroll on the off-policy families' full compiled steps.

Follow-up to the ff-PPO rollout-unroll win (j040, 1.139×): ff-ISAC is
act-bound (j260: the act side dominates at every epochs setting) and
rec-IQL's act phase is 10.8% of its fused step (j030), so
`system.rollout_unroll` on their act scans is the same latency-amortisation
lever. Times unroll ∈ {1, 2} on the full compiled update for both systems at
their recorded operating points, all in ONE process.

Usage: python scripts/profile_offpolicy_unroll_ab.py [timed_calls]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from mava_tpu.parallel import make_mesh, num_learner_devices
from mava_tpu.utils.config import load_config

IQL_OVERRIDES = [
    "env=smax",
    "env/scenario=2s3z",
    "arch.num_envs=64",
    "logger.use_console=False",
]
SAC_OVERRIDES = [
    "env=mawalker",
    "arch.num_envs=64",
    "logger.use_console=False",
]
SCAN_STEPS = 32


def timed(step_fn, state, n):
    state = step_fn(state)
    jax.block_until_ready(state)
    start = time.perf_counter()
    for _ in range(n):
        state = step_fn(state)
    jax.block_until_ready(state)
    return (time.perf_counter() - start) / n


def build_iql(unroll):
    from mava_tpu.systems.q_learning import rec_iql

    cfg = load_config(
        "default_rec_iql", IQL_OVERRIDES + [f"+system.rollout_unroll={unroll}"]
    )
    mesh = make_mesh()
    cfg.arch.n_devices = num_learner_devices(mesh)
    cfg.system.scan_steps = SCAN_STEPS
    (env, _), q_net, opt, rb, state, _ = rec_iql.init(cfg, mesh)
    update = rec_iql.build_learn_fn(cfg, env, q_net, opt, rb, mesh, state.buffer_state)

    def step(s):
        s, _ = update(s)
        return s

    steps = SCAN_STEPS * cfg.system.rollout_length * 64
    return step, state, steps


def build_sac(unroll):
    from mava_tpu.systems.sac import ff_isac

    cfg = load_config(
        "default_ff_isac", SAC_OVERRIDES + [f"+system.rollout_unroll={unroll}"]
    )
    mesh = make_mesh()
    cfg.arch.n_devices = num_learner_devices(mesh)
    cfg.system.scan_steps = SCAN_STEPS
    explore, update, state = ff_isac.build_bench_learners(cfg, mesh)
    state, _ = explore(state)
    jax.block_until_ready(state)

    def step(s):
        s, _ = update(s)
        return s

    steps = SCAN_STEPS * cfg.system.rollout_length * 64
    return step, state, steps


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    results = {}
    for name, builder in (("rec_iql", build_iql), ("ff_isac", build_sac)):
        for unroll in (1, 2):
            key = f"{name}-unroll{unroll}"
            try:
                step, state, steps = builder(unroll)
                dt = timed(step, state, n)
            except Exception as e:
                results[key] = {"error": f"{type(e).__name__}: {e}"}
                print(f"{key}: FAILED ({type(e).__name__}: {e})", flush=True)
                continue
            results[key] = {"s_per_call": dt, "steps_per_s": steps / dt}
            print(
                f"{key}: {dt*1e3:.1f} ms/call, {steps/dt:,.0f} env-steps/s",
                flush=True,
            )

    def ratio(a, b):
        if all("s_per_call" in results.get(k, {}) for k in (a, b)):
            return round(results[a]["s_per_call"] / results[b]["s_per_call"], 3)
        return None

    print(
        json.dumps(
            {
                "offpolicy_unroll_ab": results,
                "iql_1_vs_2": ratio("rec_iql-unroll1", "rec_iql-unroll2"),
                "sac_1_vs_2": ratio("ff_isac-unroll1", "ff_isac-unroll2"),
            }
        )
    )


if __name__ == "__main__":
    main()
