"""Decompose the Cleaner/CNN ff-IPPO step: env scan vs CNN fwd vs full step."""

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
NUM_ENVS = 64


def timeit(fn, n=10):
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
            "env=cleaner",
            "env/scenario=clean-10x10x10a",
            "network=cnn",
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

    t = timeit(lambda: learn(state))
    print(
        f"FULL cnn step : {t*1e3:8.2f} ms ({ROLLOUT*NUM_ENVS/t:,.0f} steps/s)",
        flush=True,
    )

    env_state0, ts0 = state.env_state, state.timestep
    key0 = jax.random.PRNGKey(1)
    params = state.params

    @jax.jit
    def env_scan(env_state, ts, key):
        def step(carry, _):
            env_state, ts, key = carry
            key, ka = jax.random.split(key)
            action = jax.random.randint(
                ka, (NUM_ENVS, env.num_agents), 0, env.action_dim
            )
            env_state, ts = jax.vmap(env.step)(env_state, action)
            return (env_state, ts, key), (
                ts.reward.sum() + ts.observation.agents_view.sum() * 1e-9
            )

        _, out = jax.lax.scan(step, (env_state, ts, key), None, ROLLOUT)
        return out.sum()

    t = timeit(lambda: env_scan(env_state0, ts0, key0))
    print(f"env-only scan : {t*1e3:8.2f} ms ({t/ROLLOUT*1e6:7.1f} us/iter)", flush=True)

    # CNN fwd alone on the real obs batch (static, not in scan)
    obs = ts0.observation
    f = jax.jit(lambda p, o: actor_network.apply(p, o).logits.sum())
    t = timeit(lambda: f(params.actor_params, obs), n=50)
    print(f"actor CNN fwd : {t*1e3:8.3f} ms (batch {obs.agents_view.shape})", flush=True)


if __name__ == "__main__":
    main()
