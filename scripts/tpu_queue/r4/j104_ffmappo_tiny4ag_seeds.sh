#!/bin/bash
# Seed band for the north-star ff-MAPPO RWARE tiny-4ag row (single seed
# 0 -> 15.8 over 20M). 3 vmapped seeds at the recorded 256-env operating
# point (the 20M run's 1.073M steps/s matches bench_suite's 256-env number).
cd /root/repo
timeout 7200 python -m mava_tpu.advanced_usage.ff_mappo_vmap_seeds \
  env=rware env/scenario=tiny-4ag arch.num_envs=256 \
  system.total_timesteps=20000000 arch.num_evaluation=40 \
  +system.num_seeds=3 logger.use_json=True
