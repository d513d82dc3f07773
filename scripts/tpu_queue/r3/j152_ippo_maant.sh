#!/bin/bash
# ff-IPPO continuous MaAnt (gait learning) — r2 job12 rerun (was cut off mid-run).
cd /root/repo
timeout 3000 python -m mava_tpu.systems.ppo.ff_ippo env=maant \
  network=continuous_mlp system.total_timesteps=5000000 arch.num_envs=256 \
  arch.num_evaluation=20 logger.use_json=True
