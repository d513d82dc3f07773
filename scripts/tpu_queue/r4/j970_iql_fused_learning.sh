#!/bin/bash
# Learning sanity for the shipping fused_target_pass default (mirror of r3's
# j030 check for the pallas default): rec-IQL 2s3z, 2M steps — win rate must
# climb into the same band as the r3 trajectory (47%@0.8M on the way to 92%).
cd /root/repo
timeout 4000 python -m mava_tpu.systems.q_learning.rec_iql \
  env=smax env/scenario=2s3z arch.num_envs=64 \
  system.total_timesteps=2000000 arch.num_evaluation=20 \
  arch.num_eval_episodes=32 logger.use_json=True
