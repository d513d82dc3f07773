#!/bin/bash
# rec-IQL on SMAX 3s_vs_5z (VERDICT next-10): eps-greedy exploration is a
# genuinely different mechanism than the 4 failed PPO entropy configs. 10M
# steps; any nonzero win rate, or a fifth recorded negative config, closes
# the book on the last SMAX map.
cd /root/repo
timeout 5400 python -m mava_tpu.systems.q_learning.rec_iql env=smax \
  env/scenario=3s_vs_5z arch.num_envs=64 system.total_timesteps=10000000 \
  arch.num_evaluation=40 logger.use_json=True
