"""CNN-path perf pass (VERDICT r2 next-5): one-process A/B on the REAL step.

Times the full compiled ff-IPPO Cleaner step for compute_dtype in
{float32, bfloat16} (both variants built in ONE process — CLAUDE.md tunnel
timing rule), then decomposes the winner: env-only scan, actor fwd, actor
fwd+bwd. BASELINE.md context: 95k steps/s f32 vs 112k bf16 (+19%) at 128 envs
was measured across processes in round 1; this pins the ratio in-process and
covers the backward pass explicitly (the epoch phase differentiates through
the CNN; compute_dtype applies there too by construction — same apply fn).

Usage: python scripts/profile_cnn_ab.py [timed_calls]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mava_tpu import envs as environments
from mava_tpu.parallel import make_mesh, num_learner_devices
from mava_tpu.systems.ppo.ff_ippo import learner_setup
from mava_tpu.utils.config import load_config

ROLLOUT = 128
NUM_ENVS = 128


def build(dtype: str):
    cfg = load_config(
        "default_ff_ippo",
        [
            "env=cleaner",
            "env/scenario=clean-10x10x10a",
            "network=cnn",
            f"arch.num_envs={NUM_ENVS}",
            f"system.rollout_length={ROLLOUT}",
            f"+network.actor_network.pre_torso.compute_dtype={dtype}",
            f"+network.critic_network.pre_torso.compute_dtype={dtype}",
            "logger.use_console=False",
        ],
    )
    mesh = make_mesh()
    cfg.arch.n_devices = num_learner_devices(mesh)
    cfg.system.num_updates = 4096
    cfg.system.num_updates_per_eval = 1
    env, _ = environments.make(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    learn, actor_network, state = learner_setup(env, tuple(keys), cfg, mesh)
    return learn, actor_network, state, env


def timed(fn, state, n):
    out = fn(state)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(n):
        out = fn(out.learner_state)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / n


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    results = {}
    built = {}
    for dtype in ("float32", "bfloat16"):
        learn, actor_network, state, env = build(dtype)
        built[dtype] = (learn, actor_network, state, env)
        dt = timed(learn, state, n)
        sps = ROLLOUT * NUM_ENVS / dt
        results[dtype] = {"step_ms": round(dt * 1e3, 2), "steps_per_s": round(sps)}
        print(f"{dtype}: {dt*1e3:.1f} ms/update, {sps:,.0f} env-steps/s", flush=True)

    ratio = results["float32"]["step_ms"] / results["bfloat16"]["step_ms"]
    print(f"bf16 speedup on the full step: {ratio:.3f}x", flush=True)

    # Decompose the winner (or f32 if bf16 loses): fwd-only and fwd+bwd on the
    # real observation batch, plus the env-only scan, to show where the
    # milliseconds live at this size.
    dtype = "bfloat16" if ratio > 1.0 else "float32"
    learn, actor_network, state, env = built[dtype]
    obs = state.timestep.observation
    params = state.params

    fwd = jax.jit(lambda p, o: actor_network.apply(p, o).logits.sum())
    t_fwd = _t(lambda: fwd(params.actor_params, obs))

    grad = jax.jit(jax.grad(lambda p, o: actor_network.apply(p, o).logits.sum()))
    t_bwd = _t(lambda: grad(params.actor_params, obs))

    @jax.jit
    def env_scan(env_state, ts, key):
        def step(carry, _):
            env_state, ts, key = carry
            key, ka = jax.random.split(key)
            action = jax.random.randint(
                ka, (NUM_ENVS, env.num_agents), 0, env.action_dim
            )
            env_state, ts = jax.vmap(env.step)(env_state, action)
            return (env_state, ts, key), ts.reward.sum()

        _, out = jax.lax.scan(step, (env_state, ts, key), None, ROLLOUT)
        return out.sum()

    t_env = _t(lambda: env_scan(state.env_state, state.timestep, jax.random.PRNGKey(1)))

    decomp = {
        "winner": dtype,
        "actor_fwd_ms": round(t_fwd * 1e3, 3),
        "actor_fwd_bwd_ms": round(t_bwd * 1e3, 3),
        "env_only_scan_ms": round(t_env * 1e3, 2),
    }
    print(json.dumps({"cnn_ab": results, "bf16_speedup": round(ratio, 3), **decomp}))


def _t(fn, n=50):
    out = fn()
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / n


if __name__ == "__main__":
    main()
