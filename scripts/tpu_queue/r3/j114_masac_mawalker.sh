#!/bin/bash
# MASAC mawalker at reference defaults (epochs=32) — r2 rerun, logs lost.
cd /root/repo
timeout 3000 python -m mava_tpu.systems.sac.ff_masac env=mawalker \
  system.total_timesteps=300000 arch.num_envs=64 arch.num_evaluation=30 \
  logger.use_json=True
