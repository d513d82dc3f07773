"""rec-IPPO on SMAX: decompose full step vs rollout vs env-only."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mava_tpu import envs as environments
from mava_tpu.parallel import make_mesh, num_learner_devices
from mava_tpu.systems.ppo.rec_ippo import learner_setup
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
        "default_rec_ippo",
        [
            "env=smax",
            "env/scenario=3s5z",
            "network=rnn",
            f"arch.num_envs={NUM_ENVS}",
            f"system.rollout_length={ROLLOUT}",
            "system.recurrent_chunk_size=16",
            "logger.use_console=False",
        ],
    )
    mesh = make_mesh()
    cfg.arch.n_devices = num_learner_devices(mesh)
    cfg.system.num_updates = 128
    cfg.system.num_updates_per_eval = 1
    env, _ = environments.make(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    learn, _, state = learner_setup(env, tuple(keys), cfg, mesh, False)

    t = timeit(lambda: learn(state))
    print(
        f"FULL rec step : {t*1e3:8.2f} ms ({ROLLOUT*NUM_ENVS/t:,.0f} steps/s)",
        flush=True,
    )

    # env-only scan with random actions + obs consumed
    env_state0 = state.env_state
    ts0 = state.timestep
    key0 = jax.random.PRNGKey(1)

    @jax.jit
    def env_scan(env_state, ts, key):
        def step(carry, _):
            env_state, ts, key = carry
            key, ka = jax.random.split(key)
            action = jax.random.randint(ka, (NUM_ENVS, env.num_agents), 0, env.action_dim)
            env_state, ts = jax.vmap(env.step)(env_state, action)
            return (env_state, ts, key), (
                ts.reward.sum() + ts.observation.agents_view.sum() * 1e-9
            )

        _, out = jax.lax.scan(step, (env_state, ts, key), None, ROLLOUT)
        return out.sum()

    t = timeit(lambda: env_scan(env_state0, ts0, key0))
    print(f"env-only scan : {t*1e3:8.2f} ms ({t/ROLLOUT*1e6:6.1f} us/iter)", flush=True)


if __name__ == "__main__":
    main()
