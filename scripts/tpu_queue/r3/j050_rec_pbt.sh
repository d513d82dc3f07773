#!/bin/bash
# rec-IPPO PBT (pop 4) on SMAX 2s3z — r2 job19 rerun with the rank-metric fix
# (541f5be: eval_metric win_rate -> evaluator's won_episode key).
cd /root/repo
timeout 3000 python -m mava_tpu.advanced_usage.rec_ippo_pbt \
  env=smax env/scenario=2s3z network=rnn arch.num_envs=32 \
  system.recurrent_chunk_size=16 system.total_timesteps=2000000 \
  arch.num_evaluation=10 \
  '+system.pbt_population=4' '+system.pbt_lr_range=[5e-5, 5e-3]' \
  logger.use_console=False
