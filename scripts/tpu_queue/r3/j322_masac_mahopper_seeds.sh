#!/bin/bash
# Seed breadth for the CTDE arm: MASAC MaHopper single-seed row was abs 287.5
# (j106, matching the lost-r2 note); 4 vmapped seeds pin the spread for the
# centralised-critic family too.
cd /root/repo
timeout 5400 python -m mava_tpu.advanced_usage.ff_masac_vmap_seeds \
  env=mahopper system.total_timesteps=300000 arch.num_envs=64 \
  arch.num_evaluation=30 +system.num_seeds=4 system.buffer_size=400000 \
  logger.use_json=True
