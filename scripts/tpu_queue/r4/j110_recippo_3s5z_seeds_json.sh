#!/bin/bash
# North-star curve evidence: rec-IPPO SMAX 3s5z (r1 single-seed 91.6% abs
# predates JSON logging). 3 vmapped seeds at the recorded operating point.
cd /root/repo
timeout 7200 python -m mava_tpu.advanced_usage.rec_ippo_vmap_seeds \
  env=smax env/scenario=3s5z network=rnn arch.num_envs=64 \
  system.recurrent_chunk_size=16 system.total_timesteps=10000000 \
  arch.num_evaluation=40 +system.num_seeds=3 logger.use_json=True
