"""Decompose the rollout policy cost: actor fwd / critic fwd / sampling / RNG split.

Also measures env-count scaling of the full rollout (latency- vs throughput-bound).
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


def timeit(fn, n=10):
    out = fn()
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / n


def build(num_envs):
    cfg = load_config(
        "default_ff_ippo",
        [
            f"arch.num_envs={num_envs}",
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
    return cfg, env, learn, actor_network, state


def main():
    part = sys.argv[1] if len(sys.argv) > 1 else "all"
    if part in ("all", "scale"):
        part1()
    if part in ("all", "components"):
        part2()


def part1():
    # --- Part 1: env scaling of full train step ---
    for num_envs in (512, 1024, 2048):
        cfg, env, learn, actor_network, state = build(num_envs)
        t = timeit(lambda: learn(state))
        sps = ROLLOUT * num_envs / t
        print(f"full step envs={num_envs:5d}: {t*1e3:8.2f} ms  {sps:12,.0f} steps/s", flush=True)


def part2():
    # --- Part 2: per-component scan cost at 256 envs ---
    num_envs = 256
    cfg, env, learn, actor_network, state = build(num_envs)
    params = state.params
    ts0 = state.timestep
    obs = ts0.observation
    key = jax.random.PRNGKey(1)

    from mava_tpu.networks import FeedForwardValueNet
    from mava_tpu.networks.factory import make_torso

    critic_network = FeedForwardValueNet(
        torso=make_torso(cfg.network.critic_network.pre_torso)
    )
    critic_params = params.critic_params

    def scan_n(body):
        @jax.jit
        def run(carry):
            return jax.lax.scan(lambda c, _: (body(c), None), carry, None, ROLLOUT)[0]
        return run

    # a) actor fwd only (carry a dummy to serialize)
    def actor_fwd(c):
        pi = actor_network.apply(params.actor_params, obs)
        return c + pi.mode().sum()

    # b) actor fwd + sample + log_prob (fixed key)
    def actor_sample(c):
        pi = actor_network.apply(params.actor_params, obs)
        a = pi.sample(seed=key)
        return c + pi.log_prob(a).sum()

    # c) critic fwd
    def critic_fwd(c):
        v = critic_network.apply(critic_params, obs)
        return c + v.sum()

    # d) RNG split chain
    def rng_split(c):
        k = jax.random.split(jax.random.fold_in(key, c.astype(jnp.int32)[()] * 0))[0]
        return c + k[0].astype(jnp.float32) * 0 + 1

    for name, body in [
        ("actor fwd", actor_fwd),
        ("actor fwd+sample", actor_sample),
        ("critic fwd", critic_fwd),
        ("rng split chain", rng_split),
    ]:
        run = scan_n(body)
        t = timeit(lambda: run(jnp.float32(0)))
        print(f"{name:18s}: {t*1e3:8.2f} ms / {ROLLOUT} iters", flush=True)


if __name__ == "__main__":
    main()
