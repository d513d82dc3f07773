#!/bin/bash
# Iterated prisoner's dilemma via the new Custom-payoff Matrax task: a crisp
# game-theoretic prediction to validate against — independent PPO learners
# converge to mutual defection (1.0/step -> return ~10 at time_limit 10),
# not the cooperative 3.0/step.
cd /root/repo
timeout 1800 python -m mava_tpu.systems.ppo.ff_ippo env=matrax \
  env/scenario=matrax-pd arch.num_envs=64 system.total_timesteps=500000 \
  arch.num_evaluation=10 logger.use_json=True
