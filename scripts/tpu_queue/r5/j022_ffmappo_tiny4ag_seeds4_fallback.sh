#!/bin/bash
# The j105 variant (4 seeds -> f32[4,8,256,4] windowed op) of the same crash.
cd /root/repo
timeout 5400 python -m mava_tpu.advanced_usage.ff_mappo_vmap_seeds \
  env=rware env/scenario=tiny-4ag arch.num_envs=256 \
  system.total_timesteps=1000000 arch.num_evaluation=2 \
  +system.num_seeds=4
