#!/bin/bash
# ff-IPPO on the Matrax Penalty game (k=-25): the second published matrax
# family; Climbing already recorded (BASELINE).
cd /root/repo
timeout 2700 python -m mava_tpu.systems.ppo.ff_ippo env=matrax \
  env/scenario=matrax-penalty-25 system.total_timesteps=500000 arch.num_envs=64 \
  arch.num_evaluation=10 logger.use_json=True
