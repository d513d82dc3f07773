#!/bin/bash
# Post-outage rerun of the seed-123 leg of the rec-IQL 3s5z band (j923 hung in
# a compile-time tunnel RPC; j924 trained to 6.6M steps, win rate 68.8%, before
# the ~00:15 UTC Aug 21 tunnel outage froze the device mid-run). Tunnel probe
# confirmed back up 06:13 UTC with a real matmul. Same config as j922/j924.
cd /root/repo
timeout 3000 python scripts/run_seeds.py q_learning.rec_iql default_rec_iql 123 \
  env=smax env/scenario=3s5z arch.num_envs=64 \
  system.total_timesteps=10000000 arch.num_evaluation=50
