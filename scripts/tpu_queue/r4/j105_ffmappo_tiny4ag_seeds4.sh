#!/bin/bash
# j104 retry: the 3-seed vmapped ff-MAPPO tiny-4ag program crashed the TPU
# compiler (fusion_util.cc TransformWindow check failure on the
# f32[3,8,256,4] windowed op — an XLA bug on the odd seed dim). 4 seeds
# changes the shape; same operating point (256 envs, 20M).
cd /root/repo
timeout 7200 python -m mava_tpu.advanced_usage.ff_mappo_vmap_seeds \
  env=rware env/scenario=tiny-4ag arch.num_envs=256 \
  system.total_timesteps=20000000 arch.num_evaluation=40 \
  +system.num_seeds=4 logger.use_json=True
