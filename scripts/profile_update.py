"""Update-phase decomposition: epochs scaling, permutation cost, GAE cost."""

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


def build(ppo_epochs, num_minibatches):
    cfg = load_config(
        "default_ff_ippo",
        [
            f"arch.num_envs={NUM_ENVS}",
            f"system.rollout_length={ROLLOUT}",
            f"system.ppo_epochs={ppo_epochs}",
            f"system.num_minibatches={num_minibatches}",
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
    return learn, state


def main():
    for epochs, mb in [(1, 1), (1, 2), (2, 2), (4, 2), (4, 1)]:
        learn, state = build(epochs, mb)
        t = timeit(lambda: learn(state))
        print(f"epochs={epochs} mb={mb}: {t*1e3:8.2f} ms", flush=True)

    # permutation + gather cost standalone
    n = ROLLOUT * NUM_ENVS
    data = jnp.ones((n, 2, 80), jnp.float32)  # ~ obs-sized payload

    @jax.jit
    def perm_gather(key, data):
        p = jax.random.permutation(key, n)
        return jnp.take(data, p, axis=0).sum()

    @jax.jit
    def perm_only(key):
        return jax.random.permutation(key, n).sum()

    key = jax.random.PRNGKey(0)
    t = timeit(lambda: perm_only(key))
    print(f"permutation({n})          : {t*1e3:8.3f} ms", flush=True)
    t = timeit(lambda: perm_gather(key, data))
    print(f"permutation+gather        : {t*1e3:8.3f} ms", flush=True)

    # GAE standalone
    from mava_tpu.ops import calculate_gae

    r = jnp.ones((ROLLOUT, NUM_ENVS, 2), jnp.float32)
    v = jnp.ones((ROLLOUT, NUM_ENVS, 2), jnp.float32)
    d = jnp.zeros((ROLLOUT, NUM_ENVS, 2), jnp.float32)
    lv = jnp.ones((NUM_ENVS, 2), jnp.float32)

    @jax.jit
    def gae(r, v, d, lv):
        a, t_ = calculate_gae(r, v, d, lv, 0.99, 0.95)
        return a.sum() + t_.sum()

    t = timeit(lambda: gae(r, v, d, lv))
    print(f"GAE scan                  : {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
