"""Isolate RWARE env-step cost: raw step vs wrapped step vs reset, dynamic actions."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mava_tpu import envs as environments
from mava_tpu.envs.rware import RobotWarehouse
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


def scan_env(env, env_state, key0, num_agents):
    @jax.jit
    def run(env_state, key0):
        def step(carry, _):
            env_state, k = carry
            k, ka = jax.random.split(k)
            action = jax.random.randint(ka, (NUM_ENVS, num_agents), 0, 5)
            env_state, ts = jax.vmap(env.step)(env_state, action)
            return (env_state, k), ts.reward.sum()

        (env_state, k), r = jax.lax.scan(step, (env_state, key0), None, ROLLOUT)
        return env_state, r.sum()

    return run


def main():
    cfg = load_config(
        "default_ff_ippo",
        [f"arch.num_envs={NUM_ENVS}", "logger.use_console=False"],
    )
    cfg.arch.n_devices = 1
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, NUM_ENVS)

    # raw env (no wrappers)
    raw = RobotWarehouse()
    raw_state, _ = jax.jit(jax.vmap(raw.reset))(keys)
    run_raw = scan_env(raw, raw_state, key, raw.num_agents)
    t = timeit(lambda: run_raw(raw_state, key))
    print(f"raw env step     : {t/ROLLOUT*1e6:7.1f} us/iter", flush=True)

    # wrapped env (AgentID + AutoReset + RecordEpisodeMetrics)
    env, _ = environments.make(cfg)
    wst, _ = jax.jit(jax.vmap(env.reset))(keys)
    run_w = scan_env(env, wst, key, env.num_agents)
    t = timeit(lambda: run_w(wst, key))
    print(f"wrapped env step : {t/ROLLOUT*1e6:7.1f} us/iter", flush=True)

    # reset alone (vmapped), in a scan
    @jax.jit
    def run_reset(key0):
        def step(k, _):
            k, kr = jax.random.split(k)
            st, ts = jax.vmap(raw.reset)(jax.random.split(kr, NUM_ENVS))
            return k, ts.reward.sum()
        return jax.lax.scan(step, key0, None, ROLLOUT)[1].sum()

    t = timeit(lambda: run_reset(key))
    print(f"raw reset        : {t/ROLLOUT*1e6:7.1f} us/iter", flush=True)


if __name__ == "__main__":
    main()
