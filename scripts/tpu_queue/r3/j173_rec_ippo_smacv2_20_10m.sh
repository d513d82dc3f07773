#!/bin/bash
# smacv2_20_units at the JaxMARL evaluation budget (10M steps): the 2M run
# (j168) reached 25.6% absolute while still climbing; this settles where the
# hardest published SMACv2 composition lands at the budget baselines use.
cd /root/repo
timeout 7200 python -m mava_tpu.systems.ppo.rec_ippo env=smax \
  env/scenario=smacv2_20_units network=rnn arch.num_envs=64 \
  system.recurrent_chunk_size=16 system.total_timesteps=10000000 \
  arch.num_evaluation=40 logger.use_json=True
