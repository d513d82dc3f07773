#!/bin/bash
# North-star ff-MAPPO RWARE tiny-4ag at the REFERENCE'S OWN 16-env config
# (BASELINE rows so far used the 256-env operating point: 15.8 @20M single
# seed, j107 band 11.1-16.2). 16 envs = 9765 updates at 20M — the
# update-count effect gave tiny-2ag its best result at this env count (17.0).
cd /root/repo
timeout 8000 python -m mava_tpu.systems.ppo.ff_mappo \
  env=rware env/scenario=tiny-4ag arch.num_envs=16 \
  system.total_timesteps=20000000 logger.use_json=True
