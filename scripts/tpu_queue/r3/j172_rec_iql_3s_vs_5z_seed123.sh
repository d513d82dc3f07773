#!/bin/bash
# Third seed for the 3s_vs_5z rec-IQL claim (see j170/j171).
cd /root/repo
timeout 5400 python -m mava_tpu.systems.q_learning.rec_iql env=smax \
  env/scenario=3s_vs_5z arch.num_envs=64 system.total_timesteps=10000000 \
  arch.num_evaluation=40 system.seed=123 logger.use_json=True
