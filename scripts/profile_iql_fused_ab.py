"""A/B the FUSED double-DQN target pass on the REAL rec-IQL compiled step.

VERDICT r3 #1: rec-IQL's train phase is 96% of the fused act+train step (j250
phase split) and ran THREE full-length GRU scans per epoch — the loss pass
plus separate online-greedy and target passes over the identical next_inputs.
`system.fused_target_pass` folds the online+target pair into ONE vmapped pass
of stacked params (2x batch, one serial recurrence chain). This measures the
full compiled step for the 2x2 matrix {fused, unfused} x {pallas, hoisted}
in ONE process (CLAUDE.md timing rule: tunnel timings jitter up to 2x across
processes) at the recorded SMAX operating point (2s3z, 64 envs — BASELINE.md
rec-IQL row). The winner sets the shipping defaults.

Reference contrast: `mava/systems/q_learning/rec_iql.py:400-420` always pays
the sequential double pass.

Usage: python scripts/profile_iql_fused_ab.py [timed_calls]
"""

from __future__ import annotations

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from mava_tpu.parallel.mesh import make_mesh, num_learner_devices
from mava_tpu.systems.q_learning import rec_iql
from mava_tpu.utils.config import load_config

SCAN_STEPS = int(os.environ.get("AB_SCAN_STEPS", 32))
NUM_ENVS = int(os.environ.get("AB_NUM_ENVS", 64))
OVERRIDES = [
    "env=smax",
    "env/scenario=2s3z",
    f"arch.num_envs={NUM_ENVS}",
    "logger.use_console=False",
]


def build(cfg):
    mesh = make_mesh()
    cfg.arch.n_devices = num_learner_devices(mesh)
    cfg.system.scan_steps = SCAN_STEPS
    (env, _), q_net, opt, rb, state, _ = rec_iql.init(cfg, mesh)
    update = rec_iql.build_learn_fn(
        cfg, env, q_net, opt, rb, mesh, state.buffer_state
    )
    return update, state, cfg


def timed(update, state, n):
    state, _ = update(state)  # compile + warm the buffer
    jax.block_until_ready(state)
    start = time.perf_counter()
    for _ in range(n):
        state, _ = update(state)
    jax.block_until_ready(state)
    return (time.perf_counter() - start) / n


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    results = {}
    for fused, impl in itertools.product((True, False), ("pallas", "hoisted")):
        name = f"{'fused' if fused else 'unfused'}-{impl}"
        try:
            cfg = load_config(
                "default_rec_iql",
                list(OVERRIDES)
                + [
                    f"network.gru_impl={impl}",
                    f"system.fused_target_pass={fused}",
                ],
            )
            update, state, cfg = build(cfg)
            dt = timed(update, state, n)
        except Exception as e:  # a failing variant must not kill the A/B
            results[name] = {"error": f"{type(e).__name__}: {e}"}
            print(f"{name}: FAILED ({type(e).__name__}: {e})", flush=True)
            continue
        steps = SCAN_STEPS * cfg.system.rollout_length * NUM_ENVS
        results[name] = {"s_per_call": dt, "steps_per_s": steps / dt}
        print(
            f"{name}: {dt*1e3:.1f} ms/call, {steps/dt:,.0f} env-steps/s",
            flush=True,
        )

    def ratio(a, b):
        if all("s_per_call" in results.get(k, {}) for k in (a, b)):
            return round(results[a]["s_per_call"] / results[b]["s_per_call"], 3)
        return None

    best = min(
        (k for k in results if "steps_per_s" in results[k]),
        key=lambda k: results[k]["s_per_call"],
        default=None,
    )
    print(
        json.dumps(
            {
                "iql_fused_ab": results,
                "unfused_vs_fused_pallas": ratio("unfused-pallas", "fused-pallas"),
                "unfused_vs_fused_hoisted": ratio("unfused-hoisted", "fused-hoisted"),
                "best": best,
            }
        )
    )


if __name__ == "__main__":
    main()
