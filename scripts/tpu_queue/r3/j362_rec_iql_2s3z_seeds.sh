#!/bin/bash
# Seed breadth for the off-policy family flagship: rec-IQL SMAX 2s3z was a
# single-seed 92.2%-absolute row; 3 vmapped seeds at the same 10M budget pin
# the spread (completes seed-breadth coverage across all four system
# families: j171/j172 IQL-3s_vs_5z, j320 ISAC, j322 MASAC, j324 rec-MAPPO).
cd /root/repo
timeout 7200 python -m mava_tpu.advanced_usage.rec_iql_vmap_seeds \
  env=smax env/scenario=2s3z arch.num_envs=64 \
  system.total_timesteps=10000000 arch.num_evaluation=40 \
  +system.num_seeds=3 logger.use_json=True
