#!/bin/bash
# Fixed-lr population control for j040 (same program, pbt_exploit=False):
# demonstrates whether exploit/explore beats the best/median member of the
# same initial log-uniform lr grid (VERDICT r2 weak-5).
cd /root/repo
timeout 3000 python -m mava_tpu.advanced_usage.ff_ippo_pbt \
  env=rware env/scenario=tiny-2ag arch.num_envs=64 \
  system.total_timesteps=4000000 arch.num_evaluation=20 \
  '+system.pbt_population=8' '+system.pbt_lr_range=[5e-5, 5e-3]' \
  '+system.pbt_exploit=False' \
  logger.use_console=False
