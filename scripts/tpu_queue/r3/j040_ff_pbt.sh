#!/bin/bash
# ff-IPPO PBT (pop 8) on RWARE tiny-2ag — r2 job18 rerun (logs lost with the
# container; VERDICT next-1).
cd /root/repo
timeout 3000 python -m mava_tpu.advanced_usage.ff_ippo_pbt \
  env=rware env/scenario=tiny-2ag arch.num_envs=64 \
  system.total_timesteps=4000000 arch.num_evaluation=20 \
  '+system.pbt_population=8' '+system.pbt_lr_range=[5e-5, 5e-3]' \
  logger.use_console=False
