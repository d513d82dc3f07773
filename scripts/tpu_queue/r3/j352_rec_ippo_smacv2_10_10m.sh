#!/bin/bash
# smacv2_10_units at the 10M JaxMARL budget (j160 measured 28.4% at 2M) —
# middle entry of the uniform-budget SMACv2 trio.
cd /root/repo
timeout 7200 python -m mava_tpu.systems.ppo.rec_ippo env=smax \
  env/scenario=smacv2_10_units network=rnn arch.num_envs=64 \
  system.recurrent_chunk_size=16 system.total_timesteps=10000000 \
  arch.num_evaluation=40 logger.use_json=True
