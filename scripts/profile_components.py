"""Component costs inside a scan, with carry-dependent inputs (defeats LICM)."""

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
    obs0 = state.timestep.observation
    key0 = jax.random.PRNGKey(1)

    from mava_tpu.networks import FeedForwardValueNet
    from mava_tpu.networks.factory import make_torso

    critic_network = FeedForwardValueNet(
        torso=make_torso(cfg.network.critic_network.pre_torso)
    )
    critic_params = params.critic_params

    def perturb(obs, c):
        # Make obs depend on the loop carry (cheap add) to defeat hoisting.
        return obs._replace(agents_view=obs.agents_view + c)

    def mk(body):
        @jax.jit
        def run(c0):
            def step(c, _):
                return body(c), None
            return jax.lax.scan(step, c0, None, ROLLOUT)[0]
        return run

    # baseline: perturb only
    def base(c):
        o = perturb(obs0, c)
        return o.agents_view.sum() * 1e-12

    # actor fwd (mode, no rng)
    def actor_fwd(c):
        o = perturb(obs0, c)
        pi = actor_network.apply(params.actor_params, o)
        return pi.mode().sum().astype(jnp.float32) * 1e-12

    # actor fwd + categorical sample + log_prob, key folded from carry
    def actor_sample(c):
        o = perturb(obs0, c)
        k = jax.random.fold_in(key0, (c * 1e12).astype(jnp.int32)[()])
        pi = actor_network.apply(params.actor_params, o)
        a = pi.sample(seed=k)
        return pi.log_prob(a).sum() * 1e-12

    # critic fwd
    def critic_fwd(c):
        o = perturb(obs0, c)
        v = critic_network.apply(critic_params, o)
        return v.sum() * 1e-12

    # rng split chain: carry a key through the scan
    @jax.jit
    def rng_chain(k0):
        def step(k, _):
            k, sub = jax.random.split(k)
            return k, None
        return jax.lax.scan(step, k0, None, ROLLOUT)[0]

    for name, body in [
        ("baseline(perturb)", base),
        ("actor fwd (mode)", actor_fwd),
        ("actor fwd+sample", actor_sample),
        ("critic fwd", critic_fwd),
    ]:
        run = mk(body)
        t = timeit(lambda: run(jnp.float32(0)))
        print(f"{name:18s}: {t*1e3:8.2f} ms / {ROLLOUT} iters  ({t/ROLLOUT*1e6:6.1f} us/iter)", flush=True)

    t = timeit(lambda: rng_chain(key0))
    print(f"{'rng split chain':18s}: {t*1e3:8.2f} ms / {ROLLOUT} iters  ({t/ROLLOUT*1e6:6.1f} us/iter)", flush=True)


if __name__ == "__main__":
    main()
