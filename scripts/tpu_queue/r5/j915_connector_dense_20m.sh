#!/bin/bash
# Extend the hardest Connector row (con-10x10x10a, dense 10 agents on 10x10:
# r1 -11 @2M, r3 absolute -5.0 @10M, reference plots similarly slow): 20M
# steps, CNN torso, JSON curve evidence.
cd /root/repo
timeout 8000 python -m mava_tpu.systems.ppo.ff_ippo \
  env=connector env/scenario=con-10x10x10a network=cnn \
  system.total_timesteps=20000000 arch.num_evaluation=100 \
  logger.use_json=True
