#!/bin/bash
# Hardware learning sanity for the reference-exact strided chunk layout at a
# NON-default chunk (r1 matched A/B at chunk=64 contiguous: 50.6% abs at 1M;
# control chunk=128: 56.3%). Same operating point, strided arm.
cd /root/repo
timeout 7200 python -m mava_tpu.systems.ppo.rec_ippo \
  env=smax env/scenario=3s5z network=rnn arch.num_envs=64 \
  system.recurrent_chunk_size=64 system.chunk_layout=strided \
  system.total_timesteps=1000000 arch.num_evaluation=8
