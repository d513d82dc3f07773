"""Rollout cost ladder with nothing DCE-able:

  R0: env.step + obs consumed (random actions)   -> env + observe cost
  R1: R0 but actions from the actor              -> + policy cost
  R2: R1 + critic + log_prob + transition stacking (the real learner rollout)
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

ROLLOUT = 128
NUM_ENVS = 256


def timeit(fn, n=20):
    out = fn()
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(n):
        out = fn()
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
    learn, actor_network, state = learner_setup(env, tuple(keys), cfg, mesh)
    params = state.params
    env_state0 = state.env_state
    ts0 = state.timestep
    key0 = jax.random.PRNGKey(1)

    @jax.jit
    def r0(env_state, ts, key):
        def step(carry, _):
            env_state, ts, key = carry
            key, ka = jax.random.split(key)
            action = jax.random.randint(ka, (NUM_ENVS, env.num_agents), 0, 5)
            env_state, ts = jax.vmap(env.step)(env_state, action)
            # consume obs so _observe isn't DCE'd
            return (env_state, ts, key), (
                ts.reward.sum() + ts.observation.agents_view.sum() * 1e-9
            )

        (env_state, ts, key), out = jax.lax.scan(
            step, (env_state, ts, key), None, ROLLOUT
        )
        return out.sum()

    @jax.jit
    def r1(env_state, ts, key):
        def step(carry, _):
            env_state, ts, key = carry
            key, ka = jax.random.split(key)
            pi = actor_network.apply(params.actor_params, ts.observation)
            action = pi.sample(seed=ka)
            env_state, ts = jax.vmap(env.step)(env_state, action)
            return (env_state, ts, key), ts.reward.sum()

        (env_state, ts, key), out = jax.lax.scan(
            step, (env_state, ts, key), None, ROLLOUT
        )
        return out.sum()

    t0 = timeit(lambda: r0(env_state0, ts0, key0))
    print(f"R0 env+observe        : {t0/ROLLOUT*1e6:7.1f} us/iter", flush=True)
    t1 = timeit(lambda: r1(env_state0, ts0, key0))
    print(f"R1 +actor sample      : {t1/ROLLOUT*1e6:7.1f} us/iter", flush=True)
    tf = timeit(lambda: learn(state))
    print(f"FULL train step       : {tf/ROLLOUT*1e6:7.1f} us/iter ({ROLLOUT*NUM_ENVS/tf:,.0f} steps/s)", flush=True)


if __name__ == "__main__":
    main()
