#!/bin/bash
# Treatment arm of the MaSwarm lockstep stagger A/B (see j304).
cd /root/repo
timeout 3600 python -m mava_tpu.advanced_usage.ff_ippo_vmap_seeds \
  env=maswarm network=continuous_mlp arch.num_envs=512 system.total_timesteps=20000000 \
  arch.num_evaluation=20 +system.num_seeds=8 arch.stagger_resets=True \
  logger.use_json=True
