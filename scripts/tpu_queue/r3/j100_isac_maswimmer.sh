#!/bin/bash
# ISAC maswimmer at reference defaults (epochs=32) — r2 rerun, logs lost.
cd /root/repo
timeout 2700 python -m mava_tpu.systems.sac.ff_isac env=maswimmer \
  system.total_timesteps=200000 arch.num_envs=64 arch.num_evaluation=20 \
  logger.use_json=True
