"""Decompose the PPO update epoch at bench shapes: shuffle vs fwd/bwd vs optimizer.

Builds the real ff-IPPO networks on RWARE tiny-2ag shapes and times:
  A. full 4-epoch update block exactly as ff_ippo composes it
  B. the same without the shuffle gather (identity permutation, no take)
  C. one minibatch fwd+bwd+opt alone
  D. shuffle gather alone
  E. entropy-free actor loss (is the sampled-entropy path expensive?)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from mava_tpu import envs as environments
from mava_tpu.networks import FeedForwardActor as Actor
from mava_tpu.networks import FeedForwardValueNet as Critic
from mava_tpu.networks.factory import make_action_head, make_torso
from mava_tpu.ops import clipped_ppo_policy_loss, clipped_value_loss
from mava_tpu.utils.config import load_config
from mava_tpu.utils.jax_utils import merge_leading_dims

NUM_ENVS = 256
ROLLOUT = 128
EPOCHS = 4
MINIBATCHES = 2


def timeit(fn, *args, n=30):
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
        [f"arch.num_envs={NUM_ENVS}", f"system.rollout_length={ROLLOUT}"],
    )
    cfg.arch.n_devices = 1
    env, _ = environments.make(cfg)
    cfg.system.num_agents = env.num_agents
    A = env.num_agents

    actor = Actor(
        torso=make_torso(cfg.network.actor_network.pre_torso),
        action_head=make_action_head(cfg.network.action_head, env.action_dim),
    )
    critic = Critic(torso=make_torso(cfg.network.critic_network.pre_torso))

    obs0 = env.observation_spec().generate_value()
    obs = jax.tree.map(
        lambda x: jnp.broadcast_to(
            x[None, None], (ROLLOUT, NUM_ENVS, *x.shape)
        ).copy(),
        obs0,
    )
    k = jax.random.PRNGKey(0)
    init_obs = jax.tree.map(lambda x: x[None], obs0)
    actor_params = actor.init(k, init_obs)
    critic_params = critic.init(k, init_obs)
    optim = optax.chain(
        optax.clip_by_global_norm(cfg.system.max_grad_norm),
        optax.adam(2.5e-4, eps=1e-5),
    )
    a_opt = optim.init(actor_params)
    c_opt = optim.init(critic_params)

    N = ROLLOUT * NUM_ENVS
    batch = {
        "obs": obs,
        "action": jnp.zeros((ROLLOUT, NUM_ENVS, A), jnp.int32),
        "value": jnp.zeros((ROLLOUT, NUM_ENVS, A)),
        "log_prob": jnp.zeros((ROLLOUT, NUM_ENVS, A)),
        "adv": jnp.ones((ROLLOUT, NUM_ENVS, A)),
        "tgt": jnp.ones((ROLLOUT, NUM_ENVS, A)),
    }

    def minibatch_step(carry, mb, with_entropy=True):
        actor_params, critic_params, a_opt, c_opt, key = carry
        key, ek = jax.random.split(key)

        def actor_loss(p):
            pi = actor.apply(p, mb["obs"])
            lp = pi.log_prob(mb["action"])
            loss = clipped_ppo_policy_loss(lp, mb["log_prob"], mb["adv"], 0.2)
            ent = pi.entropy(seed=ek).mean() if with_entropy else 0.0
            return loss - 0.01 * ent

        def critic_loss(p):
            v = critic.apply(p, mb["obs"])
            return 0.5 * clipped_value_loss(v, mb["value"], mb["tgt"], 0.2)

        al, ag = jax.value_and_grad(actor_loss)(actor_params)
        cl, cg = jax.value_and_grad(critic_loss)(critic_params)
        au, a_opt = optim.update(ag, a_opt)
        actor_params = optax.apply_updates(actor_params, au)
        cu, c_opt = optim.update(cg, c_opt)
        critic_params = optax.apply_updates(critic_params, cu)
        return (actor_params, critic_params, a_opt, c_opt, key), al + cl

    def update_block(batch, actor_params, critic_params, a_opt, c_opt, key, shuffle=True):
        key, sk = jax.random.split(key)
        perms = jax.vmap(lambda kk: jax.random.permutation(kk, N))(
            jax.random.split(sk, EPOCHS)
        )

        def epoch(carry, perm):
            flat = jax.tree.map(lambda x: merge_leading_dims(x, 2), batch)
            if shuffle:
                flat = jax.tree.map(lambda x: jnp.take(x, perm, axis=0), flat)
            mbs = jax.tree.map(
                lambda x: x.reshape(MINIBATCHES, -1, *x.shape[1:]), flat
            )
            return jax.lax.scan(minibatch_step, carry, mbs)

        carry = (actor_params, critic_params, a_opt, c_opt, key)
        carry, losses = jax.lax.scan(epoch, carry, perms)
        return carry[0], losses

    args = (batch, actor_params, critic_params, a_opt, c_opt, k)
    t = timeit(jax.jit(update_block), *args)
    print(f"A full 4-epoch block        : {t*1e3:8.2f} ms")
    t = timeit(jax.jit(lambda *a: update_block(*a, shuffle=False)), *args)
    print(f"B no-shuffle 4-epoch block  : {t*1e3:8.2f} ms")

    flat = jax.tree.map(lambda x: merge_leading_dims(x, 2), batch)
    mb = jax.tree.map(lambda x: x[: N // MINIBATCHES], flat)
    t = timeit(
        jax.jit(lambda mb, ap, cp, ao, co, key: minibatch_step((ap, cp, ao, co, key), mb)),
        mb, actor_params, critic_params, a_opt, c_opt, k,
    )
    print(f"C one minibatch step        : {t*1e3:8.2f} ms  (x{EPOCHS*MINIBATCHES} = {t*EPOCHS*MINIBATCHES*1e3:.2f})")

    perm = jax.random.permutation(k, N)
    t = timeit(
        jax.jit(
            lambda b, p: jax.tree.map(
                lambda x: jnp.take(merge_leading_dims(x, 2), p, axis=0), b
            )
        ),
        batch, perm,
    )
    print(f"D shuffle gather (1 epoch)  : {t*1e3:8.2f} ms  (x{EPOCHS} = {t*EPOCHS*1e3:.2f})")

    def mb_noent(carry, mb):
        return minibatch_step(carry, mb, with_entropy=False)

    t = timeit(
        jax.jit(lambda mb, ap, cp, ao, co, key: mb_noent((ap, cp, ao, co, key), mb)),
        mb, actor_params, critic_params, a_opt, c_opt, k,
    )
    print(f"E minibatch, no entropy     : {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
