"""A/B the GRU implementations on the REAL rec-IQL compiled update step.

Companion to scripts/profile_gru_ab.py (which measured the rec-IPPO step and
flipped the default to the fused Pallas recurrence on TPU). rec-IQL's profile
is different: the act scan steps the env one timestep at a time (T==1 — the
pallas path deliberately does NOT engage there), but every replay-train epoch
runs BPTT over sampled sequences of `sample_sequence_length` steps, which is
exactly the fused kernel's territory. This measures whether the `auto` default
(pallas on TPU) moves the off-policy recurrent family's throughput.

Both variants are built and timed in ONE process (CLAUDE.md timing rule:
tunnel timings jitter up to 2x across processes) at the recorded SMAX
operating point (2s3z, 64 envs — BASELINE.md rec-IQL row).

Usage: python scripts/profile_iql_gru_ab.py [timed_calls]
"""

from __future__ import annotations

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
    for impl in ("pallas", "hoisted"):
        try:
            cfg = load_config(
                "default_rec_iql", list(OVERRIDES) + [f"network.gru_impl={impl}"]
            )
            update, state, cfg = build(cfg)
            dt = timed(update, state, n)
        except Exception as e:  # a failing variant must not kill the A/B
            results[impl] = {"error": f"{type(e).__name__}: {e}"}
            print(f"{impl}: FAILED ({type(e).__name__}: {e})", flush=True)
            continue
        steps = SCAN_STEPS * cfg.system.rollout_length * NUM_ENVS
        results[impl] = {"s_per_call": dt, "steps_per_s": steps / dt}
        print(f"{impl}: {dt*1e3:.1f} ms/call, {steps/dt:,.0f} env-steps/s", flush=True)

    ratio = None
    if all("s_per_call" in results.get(k, {}) for k in ("pallas", "hoisted")):
        ratio = round(results["hoisted"]["s_per_call"] / results["pallas"]["s_per_call"], 3)
    print(json.dumps({"iql_gru_ab": results, "pallas_vs_hoisted": ratio}))


if __name__ == "__main__":
    main()
