"""Isolate one PPO minibatch gradient step (actor+critic fwd+bwd on 16k samples)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from mava_tpu.networks import FeedForwardActor, FeedForwardValueNet
from mava_tpu.networks.factory import make_action_head, make_torso
from mava_tpu.ops import clipped_ppo_policy_loss, clipped_value_loss
from mava_tpu.types import Observation

B = 16384  # minibatch rows (T*E/num_minibatches at 256 envs)
A = 2
F = 71
ACT = 5


def timeit(fn, n=50):
    out = fn()
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / n


def main():
    actor = FeedForwardActor(
        torso=make_torso({"type": "MLPTorso", "layer_sizes": [128, 128]}),
        action_head=make_action_head({"type": "DiscreteActionHead"}, ACT),
    )
    critic = FeedForwardValueNet(
        torso=make_torso({"type": "MLPTorso", "layer_sizes": [128, 128]})
    )
    key = jax.random.PRNGKey(0)
    obs = Observation(
        agents_view=jax.random.normal(key, (B, A, F)),
        action_mask=jnp.ones((B, A, ACT), jnp.bool_),
        step_count=jnp.zeros((B, A), jnp.int32),
    )
    ap = actor.init(key, obs)
    cp = critic.init(key, obs)
    action = jnp.zeros((B, A), jnp.int32)
    old_lp = jnp.zeros((B, A))
    gae = jax.random.normal(key, (B, A))
    targets = jax.random.normal(key, (B, A))
    old_v = jnp.zeros((B, A))
    optim = optax.adam(1e-3)
    aos = optim.init(ap)

    @jax.jit
    def actor_fwd(ap):
        pi = actor.apply(ap, obs)
        return pi.log_prob(action).sum()

    @jax.jit
    def actor_grad(ap, key):
        def loss(p):
            pi = actor.apply(p, obs)
            lp = pi.log_prob(action)
            l = clipped_ppo_policy_loss(lp, old_lp, gae, 0.2)
            ent = pi.entropy(seed=key).mean()
            return l - 0.01 * ent

        return jax.grad(loss)(ap)

    @jax.jit
    def critic_grad(cp):
        def loss(p):
            v = critic.apply(p, obs)
            return clipped_value_loss(v, old_v, targets, 0.2)

        return jax.grad(loss)(cp)

    @jax.jit
    def adam_update(g, aos, ap):
        upd, aos2 = optim.update(g, aos)
        return optax.apply_updates(ap, upd)

    t = timeit(lambda: actor_fwd(ap))
    print(f"actor fwd only      : {t*1e3:7.3f} ms")
    t = timeit(lambda: actor_grad(ap, key))
    print(f"actor grad (fwd+bwd): {t*1e3:7.3f} ms")
    t = timeit(lambda: critic_grad(cp))
    print(f"critic grad         : {t*1e3:7.3f} ms")
    g = actor_grad(ap, key)
    t = timeit(lambda: adam_update(g, aos, ap))
    print(f"adam update         : {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
