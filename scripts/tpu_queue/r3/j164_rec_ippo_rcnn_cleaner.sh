#!/bin/bash
# rec-IPPO with the recurrent-CNN torso on Cleaner: the rcnn config family's
# first recorded hardware learning run (config surface validated in r2 tests).
cd /root/repo
timeout 3600 python -m mava_tpu.systems.ppo.rec_ippo env=cleaner network=rcnn \
  arch.num_envs=64 system.recurrent_chunk_size=16 system.total_timesteps=2000000 \
  arch.num_evaluation=10 logger.use_json=True
