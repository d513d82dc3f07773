#!/bin/bash
# Same-round control arm for j060: contiguous chunk=64, identical config/seed,
# so the strided-vs-contiguous learning comparison is a same-round pair
# (r1's contiguous 50.6% was a different round/process).
cd /root/repo
timeout 7200 python -m mava_tpu.systems.ppo.rec_ippo \
  env=smax env/scenario=3s5z network=rnn arch.num_envs=64 \
  system.recurrent_chunk_size=64 system.chunk_layout=contiguous \
  system.total_timesteps=1000000 arch.num_evaluation=8
