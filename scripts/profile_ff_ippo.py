"""Decompose ff-IPPO step time: env-step scan vs network fwd vs PPO epochs.

Times three jitted programs on the real chip:
  A. full train step (rollout + GAE + ppo_epochs)
  B. rollout only (scan of policy-sample + env.step)
  C. env-only rollout (scan of env.step with fixed actions, no networks)
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
from mava_tpu.systems.ppo.ff_ippo import learner_setup
from mava_tpu.utils.config import load_config

NUM_ENVS = 256
ROLLOUT = 128


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / n


def main():
    cfg = load_config(
        "default_ff_ippo",
        [
            f"arch.num_envs={NUM_ENVS}",
            f"system.rollout_length={ROLLOUT}",
            "logger.use_console=False",
        ],
    )
    mesh = make_mesh()
    cfg.arch.n_devices = num_learner_devices(mesh)
    cfg.system.num_updates = 128
    cfg.system.num_updates_per_eval = 1

    env, _ = environments.make(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    learn, actor_network, learner_state = learner_setup(env, tuple(keys), cfg, mesh)

    # A: full step
    t_full = timeit(lambda s: learn(s), learner_state)
    sps_full = ROLLOUT * NUM_ENVS / t_full
    print(f"A full step      : {t_full*1e3:8.2f} ms  ({sps_full:,.0f} steps/s)")

    # B: rollout only (policy + env), jitted directly (single device)
    params = jax.tree.map(lambda x: x, learner_state.params)
    env_state = learner_state.env_state
    ts0 = learner_state.timestep

    actor_apply = actor_network.apply

    @jax.jit
    def rollout_only(params, env_state, ts, key):
        def step(carry, _):
            env_state, ts, key = carry
            key, k = jax.random.split(key)
            pi = actor_apply(params.actor_params, ts.observation)
            action = pi.sample(seed=k)
            env_state, ts = jax.vmap(env.step)(env_state, action)
            return (env_state, ts, key), ts.reward

        (env_state, ts, key), rews = jax.lax.scan(
            step, (env_state, ts, key), None, ROLLOUT
        )
        return env_state, rews.sum()

    key = jax.random.PRNGKey(1)
    t_roll = timeit(lambda: rollout_only(params, env_state, ts0, key), n=10)
    print(f"B rollout only   : {t_roll*1e3:8.2f} ms  ({ROLLOUT*NUM_ENVS/t_roll:,.0f} steps/s)")

    # C: env-only rollout (fixed action)
    action = jnp.zeros((NUM_ENVS, env.num_agents), dtype=jnp.int32)

    @jax.jit
    def env_only(env_state, ts):
        def step(carry, _):
            env_state, ts = carry
            env_state, ts = jax.vmap(env.step)(env_state, action)
            return (env_state, ts), ts.reward.sum()

        (env_state, ts), rews = jax.lax.scan(step, (env_state, ts), None, ROLLOUT)
        return env_state, rews.sum()

    t_env = timeit(lambda: env_only(env_state, ts0), n=10)
    print(f"C env-only       : {t_env*1e3:8.2f} ms  ({ROLLOUT*NUM_ENVS/t_env:,.0f} steps/s)")

    print(f"\nupdate (A-B)     : {(t_full-t_roll)*1e3:8.2f} ms")
    print(f"policy  (B-C)    : {(t_roll-t_env)*1e3:8.2f} ms")
    print(f"env     (C)      : {t_env*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
