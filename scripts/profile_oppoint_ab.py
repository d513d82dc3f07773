"""Operating-point A/B: default env count vs 2x/4x, ONE process, steady state.

VERDICT r4 next-4: the j974 sps-vs-envs sweep had +-25% per-point tunnel jitter
and the focused 512-vs-1024-vs-2048 comparison was never run under the repo's
own A/B rule (one process, steady state, repeated blocks). This script does
exactly that for the two families whose defaults could be leaving throughput on
the table:

  ff:  ff-IPPO RWARE tiny-2ag, rollout 128, envs {512, 1024, 2048}
       (512 is the bench.py operating point)
  rec: rec-IPPO SMAX 3s5z, rollout 128, chunk 16, envs {64, 128, 256}
       (64 is the reference convention; BASELINE hints +15% at 128)

Per point: build once, compile + 3 steady-state warmups, then REPEATS timed
blocks of N calls each — the per-block numbers expose residual within-process
jitter so the A/B verdict is a band, not a draw.

Usage: python scripts/profile_oppoint_ab.py {ff|rec} [timed_calls] [repeats]
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
from mava_tpu.utils.config import load_config

ROLLOUT = 128
UPDATES_PER_CALL = 4
WARMUPS = 3

FAMILIES = {
    "ff": {
        "default": "default_ff_ippo",
        "module": "mava_tpu.systems.ppo.ff_ippo",
        "overrides": ["env=rware", "env/scenario=tiny-2ag"],
        "env_counts": (512, 1024, 2048),
    },
    "rec": {
        "default": "default_rec_ippo",
        "module": "mava_tpu.systems.ppo.rec_ippo",
        "overrides": [
            "env=smax",
            "env/scenario=3s5z",
            "network=rnn",
            "system.recurrent_chunk_size=16",
        ],
        "env_counts": (64, 128, 256),
    },
}


def bench_point(spec: dict, num_envs: int, n: int, repeats: int) -> dict:
    import importlib

    module = importlib.import_module(spec["module"])
    cfg = load_config(
        spec["default"],
        spec["overrides"]
        + [
            f"arch.num_envs={num_envs}",
            f"system.rollout_length={ROLLOUT}",
            "logger.use_console=False",
        ],
    )
    mesh = make_mesh()
    n_devices = num_learner_devices(mesh)
    cfg.arch.n_devices = n_devices
    cfg.system.num_updates = UPDATES_PER_CALL * (repeats * n + WARMUPS + 1)
    cfg.system.num_updates_per_eval = UPDATES_PER_CALL
    env, _ = environments.make(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    learn, _, state = module.learner_setup(env, tuple(keys), cfg, mesh)

    out = learn(state)
    for _ in range(WARMUPS):
        out = learn(out.learner_state)
    jax.block_until_ready(out.learner_state)

    steps_per_call = n_devices * UPDATES_PER_CALL * ROLLOUT * num_envs
    blocks = []
    for _ in range(repeats):
        start = time.perf_counter()
        for _ in range(n):
            out = learn(out.learner_state)
        jax.block_until_ready(out.learner_state)
        dt = time.perf_counter() - start
        blocks.append(n * steps_per_call / dt / n_devices)
    blocks.sort()
    return {
        "envs": num_envs,
        "sps_blocks": [round(b, 1) for b in blocks],
        "sps_median": round(blocks[len(blocks) // 2], 1),
    }


def main() -> None:
    family = sys.argv[1] if len(sys.argv) > 1 else "ff"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spec = FAMILIES[family]
    results = []
    for num_envs in spec["env_counts"]:
        r = bench_point(spec, num_envs, n, repeats)
        results.append(r)
        print(
            f"{family} envs={num_envs}: median {r['sps_median']:,.0f} "
            f"env-steps/s/chip, blocks {r['sps_blocks']}",
            flush=True,
        )
    best = max(results, key=lambda r: r["sps_median"])
    print(
        json.dumps(
            {
                f"{family}_oppoint_ab": results,
                "best_envs": best["envs"],
                "note": "more envs at fixed total_timesteps = fewer updates; "
                "learning-validated operating points stay per BASELINE.md",
            }
        )
    )


if __name__ == "__main__":
    main()
