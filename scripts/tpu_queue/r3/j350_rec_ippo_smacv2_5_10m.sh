#!/bin/bash
# smacv2_5_units at the 10M JaxMARL budget (r2 measured 50% at a 2M probe) —
# completes the uniform-budget SMACv2 trio with j160 (10 units) and j173
# (20 units at 10M: 61.9%).
cd /root/repo
timeout 7200 python -m mava_tpu.systems.ppo.rec_ippo env=smax \
  env/scenario=smacv2_5_units network=rnn arch.num_envs=64 \
  system.recurrent_chunk_size=16 system.total_timesteps=10000000 \
  arch.num_evaluation=40 logger.use_json=True
