#!/bin/bash
# rec-IPPO on smacv2_20_units — the last configured-but-unrun scenario
# (VERDICT r2 weak-7). 40 units total, O(N^2) geometry like 27m_vs_30m.
cd /root/repo
timeout 4800 python -m mava_tpu.systems.ppo.rec_ippo env=smax \
  env/scenario=smacv2_20_units network=rnn arch.num_envs=64 \
  system.recurrent_chunk_size=16 system.total_timesteps=2000000 \
  arch.num_evaluation=10 logger.use_json=True
