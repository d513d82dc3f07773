#!/bin/bash
# MASAC MaSwarm at the reference-default epochs=32 with reward_scale=0.1
# (VERDICT next-7): the r2 row showed Q -> +10k divergence at defaults; if
# shrinking the TD target keeps Q bounded and learning monotone, the
# env-specific OOD-extrapolation explanation is confirmed with a fix in hand.
cd /root/repo
timeout 3000 python -m mava_tpu.systems.sac.ff_masac env=maswarm \
  system.total_timesteps=500000 arch.num_envs=64 arch.num_evaluation=50 \
  system.reward_scale=0.1 logger.use_json=True
