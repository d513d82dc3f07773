#!/bin/bash
# North-star curve evidence: ff-IPPO RWARE tiny-2ag at the reference's OWN
# 16-env config (r2 measured abs 17.0, logs died). 3 vmapped seeds, 20M.
cd /root/repo
timeout 7200 python -m mava_tpu.advanced_usage.ff_ippo_vmap_seeds \
  env=rware env/scenario=tiny-2ag arch.num_envs=16 \
  system.total_timesteps=20000000 arch.num_evaluation=40 \
  +system.num_seeds=3 logger.use_json=True
