"""Bisect the real ff-IPPO program: where do the update-phase milliseconds live?

Builds the REAL env + networks + state via learner_setup, then times plain-jitted
programs that add one stage at a time (no shard_map):
  P1 rollout scan -> traj_batch
  P2 + last_val + GAE
  P3 + 4-epoch minibatched update (exact ff_ippo composition, incl. pmean-free)
  P4 P3 but identity shuffle
  P5 P3 but single outer scan over num_updates (scan overhead check)
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
from mava_tpu.ops import calculate_gae, clipped_ppo_policy_loss, clipped_value_loss
from mava_tpu.systems.ppo.types import LearnerState, OptStates, Params, PPOTransition
from mava_tpu.utils.config import load_config
from mava_tpu.utils.jax_utils import merge_leading_dims
from mava_tpu.utils.training import make_learning_rate, make_optimizer

NUM_ENVS = 256
ROLLOUT = 128
EPOCHS = 4
MB = 2


def timeit(fn, *args, n=20):
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
    cfg.arch.n_devices = 1
    env, _ = environments.make(cfg)
    cfg.system.num_agents = env.num_agents

    actor = Actor(
        torso=make_torso(cfg.network.actor_network.pre_torso),
        action_head=make_action_head(cfg.network.action_head, env.action_dim),
    )
    critic = Critic(torso=make_torso(cfg.network.critic_network.pre_torso))
    key, ak, ck = jax.random.split(jax.random.PRNGKey(0), 3)
    obs0 = env.observation_spec().generate_value()
    init_x = jax.tree.map(lambda x: x[None], obs0)
    actor_params = actor.init(ak, init_x)
    critic_params = critic.init(ck, init_x)
    optim = make_optimizer(make_learning_rate(cfg.system.actor_lr, cfg), cfg.system.max_grad_norm)
    a_opt = optim.init(actor_params)
    c_opt = optim.init(critic_params)
    params = Params(actor_params, critic_params)
    opt_states = OptStates(a_opt, c_opt)

    key, *env_keys = jax.random.split(key, NUM_ENVS + 1)
    env_states, timesteps = jax.vmap(env.reset)(jnp.stack(env_keys))
    state = LearnerState(params, opt_states, key, env_states, timesteps)

    def rollout(state):
        def _env_step(learner_state, _):
            params, opt_states, key, env_state, last_timestep = learner_state
            key, policy_key = jax.random.split(key)
            actor_policy = actor.apply(params.actor_params, last_timestep.observation)
            value = critic.apply(params.critic_params, last_timestep.observation)
            action = actor_policy.sample(seed=policy_key)
            log_prob = actor_policy.log_prob(action)
            env_state, timestep = jax.vmap(env.step)(env_state, action)
            done = jnp.repeat(
                timestep.last()[:, None], cfg.system.num_agents, axis=1
            ).astype(jnp.float32)
            transition = PPOTransition(
                done, action, value, timestep.reward, log_prob,
                last_timestep.observation, {},
            )
            return LearnerState(params, opt_states, key, env_state, timestep), transition

        return jax.lax.scan(_env_step, state, None, ROLLOUT)

    def gae_part(state):
        state, traj_batch = rollout(state)
        last_val = critic.apply(state.params.critic_params, state.timestep.observation)
        advantages, targets = calculate_gae(
            traj_batch.reward, traj_batch.value, traj_batch.done, last_val,
            cfg.system.gamma, cfg.system.gae_lambda,
        )
        return state, traj_batch, advantages, targets

    def update(state, shuffle=True, mode="per_leaf"):
        state, traj_batch, advantages, targets = gae_part(state)
        params, opt_states, key = state.params, state.opt_states, state.key

        def _update_minibatch(train_state, batch_info):
            params, opt_states, key = train_state
            tb, adv, tgt = batch_info
            key, entropy_key = jax.random.split(key)

            def _actor_loss_fn(actor_params):
                pi = actor.apply(actor_params, tb.obs)
                log_prob = pi.log_prob(tb.action)
                loss_actor = clipped_ppo_policy_loss(
                    log_prob, tb.log_prob, adv, cfg.system.clip_eps
                )
                entropy = pi.entropy(seed=entropy_key).mean()
                return loss_actor - cfg.system.ent_coef * entropy, (loss_actor, entropy)

            def _critic_loss_fn(critic_params):
                value = critic.apply(critic_params, tb.obs)
                value_loss = clipped_value_loss(
                    value, tb.value, tgt, cfg.system.clip_eps
                )
                return cfg.system.vf_coef * value_loss, value_loss

            (al, a_aux), ag = jax.value_and_grad(_actor_loss_fn, has_aux=True)(params.actor_params)
            (cl, c_aux), cg = jax.value_and_grad(_critic_loss_fn, has_aux=True)(params.critic_params)
            au, a_new = optim.update(ag, opt_states.actor_opt_state)
            ap = optax.apply_updates(params.actor_params, au)
            cu, c_new = optim.update(cg, opt_states.critic_opt_state)
            cp = optax.apply_updates(params.critic_params, cu)
            return (Params(ap, cp), OptStates(a_new, c_new), key), (al, cl)

        N = ROLLOUT * NUM_ENVS

        def shuffle_per_leaf(batch, permutation):
            return jax.tree.map(lambda x: jnp.take(x, permutation, axis=0), batch)

        def shuffle_flat(batch, permutation):
            # Flatten trailing dims to make each leaf a 2D (N, W) gather.
            def tk(x):
                y = jnp.take(x.reshape(N, -1), permutation, axis=0)
                return y.reshape(x.shape)
            return jax.tree.map(tk, batch)

        def shuffle_packed(batch, permutation):
            # Pack every leaf into ONE (N, W_total) f32 buffer, gather once, unpack.
            leaves, treedef = jax.tree.flatten(batch)
            flat = [l.reshape(N, -1).astype(jnp.float32) for l in leaves]
            widths = [f.shape[1] for f in flat]
            packed = jnp.concatenate(flat, axis=1)
            packed = jnp.take(packed, permutation, axis=0)
            out = []
            off = 0
            for l, w in zip(leaves, widths):
                out.append(packed[:, off : off + w].reshape(l.shape).astype(l.dtype))
                off += w
            return jax.tree.unflatten(treedef, out)

        shuffler = {
            "per_leaf": shuffle_per_leaf,
            "flat": shuffle_flat,
            "packed": shuffle_packed,
        }[mode]

        def _update_epoch(carry, permutation):
            params, opt_states, key = carry
            batch = (traj_batch, advantages, targets)
            batch = jax.tree.map(lambda x: merge_leading_dims(x, 2), batch)
            if shuffle:
                batch = shuffler(batch, permutation)
            minibatches = jax.tree.map(
                lambda x: jnp.reshape(x, (MB, -1, *x.shape[1:])), batch
            )
            return jax.lax.scan(_update_minibatch, (params, opt_states, key), minibatches)

        key, sk = jax.random.split(key)
        perms = jax.vmap(lambda kk: jax.random.permutation(kk, ROLLOUT * NUM_ENVS))(
            jax.random.split(sk, EPOCHS)
        )
        (params, opt_states, key), losses = jax.lax.scan(
            _update_epoch, (params, opt_states, key), perms
        )
        return LearnerState(params, opt_states, key, state.env_state, state.timestep), losses

    p1 = jax.jit(rollout)
    t1 = timeit(p1, state)
    print(f"P1 rollout              : {t1*1e3:8.2f} ms")
    p2 = jax.jit(gae_part)
    t2 = timeit(p2, state)
    print(f"P2 +GAE                 : {t2*1e3:8.2f} ms   (GAE = {(t2-t1)*1e3:+.2f})")
    p3 = jax.jit(update)
    t3 = timeit(p3, state)
    print(f"P3 +4-epoch update      : {t3*1e3:8.2f} ms   (update = {(t3-t2)*1e3:+.2f})")
    p4 = jax.jit(lambda s: update(s, shuffle=False))
    t4 = timeit(p4, state)
    print(f"P4 identity shuffle     : {t4*1e3:8.2f} ms   (shuffle cost = {(t3-t4)*1e3:+.2f})")
    p5 = jax.jit(lambda s: update(s, mode="flat"))
    t5 = timeit(p5, state)
    print(f"P5 flat-2D shuffle      : {t5*1e3:8.2f} ms")
    p6 = jax.jit(lambda s: update(s, mode="packed"))
    t6 = timeit(p6, state)
    print(f"P6 packed shuffle       : {t6*1e3:8.2f} ms")

    def update_packed_once(state, block=1):
        """Pack once before the epoch scan; gather packed rows (or row-blocks)."""
        state, traj_batch, advantages, targets = gae_part(state)
        params, opt_states, key = state.params, state.opt_states, state.key
        N = ROLLOUT * NUM_ENVS

        batch = (traj_batch, advantages, targets)
        batch = jax.tree.map(lambda x: merge_leading_dims(x, 2), batch)
        leaves, treedef = jax.tree.flatten(batch)
        flat = [l.reshape(N, -1).astype(jnp.float32) for l in leaves]
        widths = [f.shape[1] for f in flat]
        packed = jnp.concatenate(flat, axis=1)
        W = packed.shape[1]
        if block > 1:
            packed = packed.reshape(N // block, block * W)

        def unpack(mb_rows):
            if block > 1:
                mb_rows = mb_rows.reshape(-1, W)
            out = []
            off = 0
            for l, w in zip(leaves, widths):
                sl = mb_rows[:, off : off + w]
                out.append(sl.reshape(-1, *l.shape[1:]).astype(l.dtype))
                off += w
            return jax.tree.unflatten(treedef, out)

        def _update_minibatch(train_state, mb_rows):
            tb, adv, tgt = unpack(mb_rows)
            params, opt_states, key = train_state
            key, entropy_key = jax.random.split(key)

            def _actor_loss_fn(actor_params):
                pi = actor.apply(actor_params, tb.obs)
                log_prob = pi.log_prob(tb.action)
                loss_actor = clipped_ppo_policy_loss(
                    log_prob, tb.log_prob, adv, cfg.system.clip_eps
                )
                entropy = pi.entropy(seed=entropy_key).mean()
                return loss_actor - cfg.system.ent_coef * entropy, (loss_actor, entropy)

            def _critic_loss_fn(critic_params):
                value = critic.apply(critic_params, tb.obs)
                value_loss = clipped_value_loss(
                    value, tb.value, tgt, cfg.system.clip_eps
                )
                return cfg.system.vf_coef * value_loss, value_loss

            (al, a_aux), ag = jax.value_and_grad(_actor_loss_fn, has_aux=True)(params.actor_params)
            (cl, c_aux), cg = jax.value_and_grad(_critic_loss_fn, has_aux=True)(params.critic_params)
            au, a_new = optim.update(ag, opt_states.actor_opt_state)
            ap = optax.apply_updates(params.actor_params, au)
            cu, c_new = optim.update(cg, opt_states.critic_opt_state)
            cp = optax.apply_updates(params.critic_params, cu)
            return (Params(ap, cp), OptStates(a_new, c_new), key), (al, cl)

        def _update_epoch(carry, permutation):
            params, opt_states, key = carry
            sh = jnp.take(packed, permutation, axis=0)
            minibatches = sh.reshape(MB, -1, sh.shape[1])
            return jax.lax.scan(_update_minibatch, (params, opt_states, key), minibatches)

        key, sk = jax.random.split(key)
        perms = jax.vmap(lambda kk: jax.random.permutation(kk, N // block))(
            jax.random.split(sk, EPOCHS)
        )
        (params, opt_states, key), losses = jax.lax.scan(
            _update_epoch, (params, opt_states, key), perms
        )
        return LearnerState(params, opt_states, key, state.env_state, state.timestep), losses

    p7 = jax.jit(update_packed_once)
    t7 = timeit(p7, state)
    print(f"P7 pack-once shuffle    : {t7*1e3:8.2f} ms")
    p8 = jax.jit(lambda s: update_packed_once(s, block=8))
    t8 = timeit(p8, state)
    print(f"P8 pack-once block-8    : {t8*1e3:8.2f} ms")
    p9 = jax.jit(lambda s: update_packed_once(s, block=32))
    t9 = timeit(p9, state)
    print(f"P9 pack-once block-32   : {t9*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
