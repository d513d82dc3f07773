#!/bin/bash
# rec-IQL SMAX 2s3z short learning sanity at the flipped default gru_impl=auto
# (pallas on TPU) — validates the default for the off-policy recurrent family
# (VERDICT next-2). 2M steps; r2's 10M run hit 47% at 0.8M, so expect a
# clearly-learning curve by 2M.
cd /root/repo
timeout 4500 python -m mava_tpu.systems.q_learning.rec_iql env=smax \
  env/scenario=2s3z arch.num_envs=64 system.total_timesteps=2000000 \
  arch.num_evaluation=40 logger.use_json=True
