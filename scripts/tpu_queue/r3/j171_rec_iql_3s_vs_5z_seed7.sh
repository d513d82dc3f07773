#!/bin/bash
# Seed robustness for the j170 headline (99.7% win on 3s_vs_5z at seed 1):
# SMAC rates this map "super hard" with bimodal outcomes across seeds, so a
# single-seed claim is weak. Same config, seed 7.
cd /root/repo
timeout 5400 python -m mava_tpu.systems.q_learning.rec_iql env=smax \
  env/scenario=3s_vs_5z arch.num_envs=64 system.total_timesteps=10000000 \
  arch.num_evaluation=40 system.seed=7 logger.use_json=True
