#!/bin/bash
# MaConnector easier scenario (con-5x5x3a): the validated row so far is the
# dense hard case (10 agents on 10x10, -5.0 absolute at 10M, matching the
# reference's similarly slow plots); this pins where the suite lands on a
# scenario the task CAN clearly solve at a modest budget.
cd /root/repo
timeout 3600 python -m mava_tpu.systems.ppo.ff_ippo env=connector \
  env/scenario=con-5x5x3a network=cnn arch.num_envs=128 \
  system.total_timesteps=5000000 arch.num_evaluation=20 logger.use_json=True
