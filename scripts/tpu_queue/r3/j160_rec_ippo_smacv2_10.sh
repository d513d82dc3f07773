#!/bin/bash
# rec-IPPO on smacv2_10_units (configured-but-unrun scenario; VERDICT next-8).
cd /root/repo
timeout 4800 python -m mava_tpu.systems.ppo.rec_ippo env=smax \
  env/scenario=smacv2_10_units network=rnn arch.num_envs=64 \
  system.recurrent_chunk_size=16 system.total_timesteps=2000000 \
  arch.num_evaluation=10 logger.use_json=True
