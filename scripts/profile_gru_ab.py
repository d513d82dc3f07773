"""A/B/C the GRU implementations on the REAL rec-IPPO compiled step.

Variants, all built and timed in ONE process (CLAUDE.md timing rule: tunnel
timings jitter up to 2x across processes) at the recorded SMAX operating point
(3s5z, 64 envs, chunk 16 — BASELINE.md rec-IPPO row):

- pallas: hoisted input projection + the serial recurrence fused into ONE
  Pallas kernel (ops/pallas_gru.py — Wh and the carry resident in VMEM for
  all T steps).
- hoisted: the default ScannedRNN — input gate projection lifted OUT of the
  scan as one wide (T*B*A, F) @ (F, 3H) matmul; the serial chain carries only
  h @ Wh + gate arithmetic.
- cell: legacy per-step FusedGRUCell (2 wide matmuls per GRU step).
- flax: stock flax.linen.GRUCell (6 Dense kernels per step — the reference's
  structure, `mava/networks/networks.py` RNN torso).

The rollout/BPTT scans are latency-bound (docs/tpu_performance.md §7) so the
expected win is proportional to the per-step kernel-count cut, not flops.

Usage: python scripts/profile_gru_ab.py [timed_calls]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from flax import linen as nn

from mava_tpu import envs as environments
from mava_tpu.networks import actor_critic
from mava_tpu.parallel.mesh import make_mesh, num_learner_devices
from mava_tpu.systems.ppo import rec_ippo
from mava_tpu.utils.config import load_config

UPDATES_PER_CALL = int(os.environ.get("AB_UPDATES", 4))
NUM_ENVS = int(os.environ.get("AB_NUM_ENVS", 64))
ROLLOUT = int(os.environ.get("AB_ROLLOUT", 128))
CHUNK = int(os.environ.get("AB_CHUNK", 16))
OVERRIDES = [
    "env=smax",
    "env/scenario=3s5z",
    "network=rnn",
    f"arch.num_envs={NUM_ENVS}",
    f"system.rollout_length={ROLLOUT}",
    f"system.recurrent_chunk_size={CHUNK}",
    "logger.use_console=False",
]


class FlaxGRUAdapter(nn.Module):
    """Drop-in stand-in for FusedGRUCell that calls the stock flax cell."""

    @nn.compact
    def __call__(self, carry: jnp.ndarray, inputs: jnp.ndarray):
        return nn.GRUCell(features=carry.shape[-1])(carry, inputs)


def build(cfg):
    env, _ = environments.make(cfg)
    mesh = make_mesh()
    cfg.arch.n_devices = num_learner_devices(mesh)
    cfg.system.num_updates_per_eval = UPDATES_PER_CALL
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    learn, _, state = rec_ippo.learner_setup(env, tuple(keys), cfg, mesh)
    return learn, state


def timed(learn, state, n):
    out = learn(state)  # compile + warm
    jax.block_until_ready(out.learner_state)
    start = time.perf_counter()
    for _ in range(n):
        out = learn(out.learner_state)
    jax.block_until_ready(out.learner_state)
    return (time.perf_counter() - start) / n


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    results = {}
    for name in ("pallas", "hoisted", "cell", "flax"):
        impl = name if name in ("pallas", "hoisted") else "cell"
        if name == "flax":
            actor_critic.FusedGRUCell = FlaxGRUAdapter  # monkeypatch for variant D
        try:
            # Select via CONFIG: learner_setup resolves network.gru_impl and
            # threads the concrete impl through network construction.
            cfg = load_config(
                "default_rec_ippo", list(OVERRIDES) + [f"network.gru_impl={impl}"]
            )
            learn, state = build(cfg)
            dt = timed(learn, state, n)
        except Exception as e:  # a failing variant must not kill the A/B
            results[name] = {"error": f"{type(e).__name__}: {e}"}
            print(f"{name}: FAILED ({type(e).__name__}: {e})", flush=True)
            continue
        steps = UPDATES_PER_CALL * cfg.system.rollout_length * cfg.arch.num_envs
        results[name] = {"s_per_call": dt, "steps_per_s": steps / dt}
        print(f"{name}: {dt*1e3:.1f} ms/call, {steps/dt:,.0f} env-steps/s", flush=True)
    def ratio(a: str, b: str):
        if "s_per_call" in results.get(a, {}) and "s_per_call" in results.get(b, {}):
            return round(results[a]["s_per_call"] / results[b]["s_per_call"], 3)
        return None

    print(
        json.dumps(
            {
                "gru_ab": results,
                "pallas_vs_hoisted": ratio("hoisted", "pallas"),
                "hoisted_vs_cell": ratio("cell", "hoisted"),
                "hoisted_vs_flax": ratio("flax", "hoisted"),
            }
        )
    )


if __name__ == "__main__":
    main()
