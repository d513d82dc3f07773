"""A/B rollout-scan unroll on the headline ff-IPPO compiled step.

The headline step is latency-bound on the rollout scan's serial chain
(docs/tpu_performance.md §7); `unroll` replicates the scan body so XLA
schedules k consecutive env steps as one loop iteration, amortising loop
overhead without changing the math (rec-IPPO has shipped `unroll=2` since
round 2). This times `system.rollout_unroll` ∈ {1, 2, 4} on the FULL
compiled step at the bench operating point (RWARE tiny-2ag, 512 envs,
rollout 128), all variants in ONE process (CLAUDE.md timing rule).

Usage: python scripts/profile_unroll_ab.py [timed_calls]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from mava_tpu import envs as environments
from mava_tpu.parallel import make_mesh, num_learner_devices
from mava_tpu.systems.ppo.ff_ippo import learner_setup
from mava_tpu.utils.config import load_config

NUM_ENVS = int(os.environ.get("AB_NUM_ENVS", 512))
ROLLOUT = int(os.environ.get("AB_ROLLOUT", 128))
UPDATES_PER_CALL = 4
WARMUP_CALLS = 2


def build(unroll: int):
    cfg = load_config(
        "default_ff_ippo",
        [
            f"arch.num_envs={NUM_ENVS}",
            f"system.rollout_length={ROLLOUT}",
            f"+system.rollout_unroll={unroll}",
            "logger.use_console=False",
        ],
    )
    mesh = make_mesh()
    cfg.arch.n_devices = num_learner_devices(mesh)
    cfg.system.num_updates = 64
    cfg.system.num_updates_per_eval = UPDATES_PER_CALL
    env, _ = environments.make(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    learn, _, state = learner_setup(env, tuple(keys), cfg, mesh)
    return learn, state


def timed(learn, state, n):
    out = learn(state)
    for _ in range(WARMUP_CALLS):
        out = learn(out.learner_state)
    jax.block_until_ready(out.learner_state)
    start = time.perf_counter()
    for _ in range(n):
        out = learn(out.learner_state)
    jax.block_until_ready(out.learner_state)
    return (time.perf_counter() - start) / n


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    results = {}
    for unroll in (1, 2, 4):
        try:
            learn, state = build(unroll)
            dt = timed(learn, state, n)
        except Exception as e:
            results[str(unroll)] = {"error": f"{type(e).__name__}: {e}"}
            print(f"unroll={unroll}: FAILED ({type(e).__name__}: {e})", flush=True)
            continue
        steps = UPDATES_PER_CALL * ROLLOUT * NUM_ENVS
        results[str(unroll)] = {"s_per_call": dt, "steps_per_s": steps / dt}
        print(
            f"unroll={unroll}: {dt*1e3:.1f} ms/call, {steps/dt:,.0f} env-steps/s",
            flush=True,
        )

    best = min(
        (k for k in results if "steps_per_s" in results[k]),
        key=lambda k: results[k]["s_per_call"],
        default=None,
    )
    print(json.dumps({"ff_ippo_unroll_ab": results, "best_unroll": best}))


if __name__ == "__main__":
    main()
