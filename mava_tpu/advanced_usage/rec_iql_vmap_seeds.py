"""rec-IQL with VMAPPED SEEDS: N independent Q-learning seeds in ONE program.

Same pattern as `ff_isac_vmap_seeds.py`: the stock `rec_iql.init` runs once
per seed (seed s = `system.seed + s`), the learner states are stacked on a
leading axis, and the stock fused act+train update fn is wrapped in
`jax.vmap` inside `shard_map` with the stock sharding specs lifted by one
unsharded seed axis. The epsilon schedule is driven by the per-seed
`time_steps` counter, which advances identically across seeds, so every seed
sees exactly the stock exploration schedule. Replay memory is replicated per
seed (`num_seeds * buffer_size` trajectories of HBM).

Usage:
    python -m mava_tpu.advanced_usage.rec_iql_vmap_seeds \
        env=smax env/scenario=2s3z +system.num_seeds=4
"""

from __future__ import annotations

import copy
import time
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from mava_tpu.advanced_usage.ff_isac_vmap_seeds import (
    lift_specs,
    place_state,
    stack_states,
)
from mava_tpu.envs.wrappers import get_final_step_metrics
from mava_tpu.evaluator import get_eval_fn, get_num_eval_envs
from mava_tpu.networks import ScannedRNN
from mava_tpu.parallel import (
    DATA_AXIS,
    build_learner,
    make_mesh,
    num_learner_devices,
)
from mava_tpu.systems.q_learning import rec_iql
from mava_tpu.utils.config import Config, load_config
from mava_tpu.utils.logger import LogEvent, MavaLogger
from mava_tpu.utils.timestep_checker import check_total_timesteps


# Sharding layout comes from the stock system — single source of truth.
_stock_specs = rec_iql._state_specs


def learner_setup(
    cfg: Config, mesh, num_seeds: int, sweep_lrs=None
) -> Tuple[Any, Any, Any, Any]:
    """Per-seed stock init, stacked. With `sweep_lrs`, entries share the SAME
    seed and differ only in q_lr, baked into optimizer state by the swept-Adam
    init (`rec_iql.init(swept_lr=True)`)."""
    states = []
    for s in range(num_seeds):
        cfg_s = copy.deepcopy(cfg)
        if sweep_lrs is None:
            cfg_s.system.seed = int(cfg.system.seed) + s
        else:
            cfg_s.system.q_lr = float(sweep_lrs[s])
        envs_, q_net, opt, rb, ls, _ = rec_iql.init(
            cfg_s, mesh, swept_lr=sweep_lrs is not None
        )
        states.append(jax.device_get(ls))
    stacked = stack_states(states)

    seed_specs = lift_specs(_stock_specs(stacked.buffer_state))
    learner_state = place_state(stacked, seed_specs, mesh)

    env, eval_env = envs_
    cfg.system.num_agents = env.num_agents  # init() set it only on seed copies
    update_fn = rec_iql.make_update_fn(cfg, env, q_net, opt, rb)
    update = build_learner(
        jax.vmap(update_fn),
        mesh,
        in_specs=(seed_specs,),
        out_specs=(seed_specs, (lift_specs(P(None, None, DATA_AXIS)), P())),
        donate=cfg.arch.get("donate_buffers", False),
    )
    return (env, eval_env), q_net, update, learner_state


def run_experiment(cfg: Config, sweep_lrs=None) -> float:
    cfg = copy.deepcopy(cfg)
    mesh = make_mesh()
    n_devices = num_learner_devices(mesh)
    cfg.arch.n_devices = n_devices
    cfg = check_total_timesteps(cfg)
    if sweep_lrs is not None:
        num_seeds = len(sweep_lrs)
    else:
        num_seeds = int(cfg.system.get("num_seeds", 4))

    steps_per_rollout = int(cfg.system.total_timesteps // cfg.arch.num_evaluation)
    anakin_act_steps = n_devices * cfg.arch.num_envs * cfg.system.rollout_length
    cfg.system.scan_steps = max(1, int(steps_per_rollout / anakin_act_steps))

    (env, eval_env), q_net, update, learner_state = learner_setup(
        cfg, mesh, num_seeds, sweep_lrs=sweep_lrs
    )

    logger = MavaLogger(cfg)
    key = jax.random.PRNGKey(cfg.system.seed)

    def eval_act_fn(params, timestep, key, actor_state):
        hidden_state = actor_state["hidden_state"]
        term_or_trunc = timestep.last()
        net_input = (timestep.observation, term_or_trunc[..., jnp.newaxis])
        net_input = jax.tree.map(lambda x: x[jnp.newaxis], net_input)
        next_hidden_state, eps_greedy_dist = q_net.apply(
            params, hidden_state, net_input, 0.0
        )
        action = eps_greedy_dist.sample(seed=key).squeeze(0)
        return action, {"hidden_state": next_hidden_state}

    evaluator = get_eval_fn(eval_env, eval_act_fn, cfg, mesh, absolute_metric=False)
    eval_batch_size = get_num_eval_envs(cfg, absolute_metric=False)

    seed_returns = jnp.zeros(num_seeds)
    for eval_idx, t in enumerate(
        range(steps_per_rollout, int(cfg.system.total_timesteps + 1), steps_per_rollout)
    ):
        start_time = time.time()
        learner_state, (metrics, losses) = update(learner_state)
        jax.block_until_ready(learner_state)

        elapsed = time.time() - start_time
        final_metrics, ep_completed = get_final_step_metrics(metrics)
        final_metrics["steps_per_second"] = num_seeds * steps_per_rollout / elapsed
        if ep_completed:
            logger.log(final_metrics, t, eval_idx, LogEvent.ACT)
        logger.log(losses, t, eval_idx, LogEvent.TRAIN)

        per_seed = []
        for s in range(num_seeds):
            key, eval_key = jax.random.split(key)
            params_s = jax.tree.map(lambda x: x[s], learner_state.params.online)
            eval_hs = ScannedRNN.initialize_carry(
                (eval_batch_size, cfg.system.num_agents),
                cfg.network.hidden_state_dim,
            )
            eval_metrics = evaluator(params_s, eval_key, {"hidden_state": eval_hs})
            per_seed.append(float(jnp.mean(eval_metrics["episode_return"])))
        seed_returns = jnp.array(per_seed)
        logger.log(
            {
                "episode_return": seed_returns,
                "seed_return_best": float(seed_returns.max()),
                "seed_return_worst": float(seed_returns.min()),
            },
            t,
            eval_idx,
            LogEvent.EVAL,
        )

    if sweep_lrs is not None:
        print(
            "vmap-sweep final eval returns per lr: "
            + ", ".join(f"lr={lr:g}: {r:.2f}" for lr, r in zip(sweep_lrs, per_seed))
        )
    else:
        print(
            "vmap-seeds final eval returns per seed: "
            + ", ".join(f"{r:.2f}" for r in per_seed)
        )
    logger.stop()
    return float(seed_returns.mean())


def main() -> float:
    import sys

    from mava_tpu.parallel import initialize

    initialize()
    cfg = load_config("default_rec_iql", sys.argv[1:])
    performance = run_experiment(cfg)
    print("rec-IQL vmap-seeds experiment completed.")
    return performance


if __name__ == "__main__":
    main()
