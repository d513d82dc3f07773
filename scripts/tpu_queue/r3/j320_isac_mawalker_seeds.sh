#!/bin/bash
# Seed breadth for the articulated-suite flagship: ISAC MaWalker was a
# single-seed row (abs 575.1, j112); 4 vmapped seeds in one program pin the
# spread. buffer_size trimmed to the step budget (replay is replicated per
# seed — HBM scales as num_seeds x buffer).
cd /root/repo
timeout 5400 python -m mava_tpu.advanced_usage.ff_isac_vmap_seeds \
  env=mawalker system.total_timesteps=300000 arch.num_envs=64 \
  arch.num_evaluation=30 +system.num_seeds=4 system.buffer_size=400000 \
  logger.use_json=True
