#!/bin/bash
# ff-IPPO on a gigastep waypoint map (configured-but-unrun; VERDICT next-8).
cd /root/repo
timeout 3000 python -m mava_tpu.systems.ppo.ff_ippo env=gigastep \
  env/scenario=waypoint_5_vs_5_fobs system.total_timesteps=2000000 \
  arch.num_envs=128 arch.num_evaluation=10 logger.use_json=True
