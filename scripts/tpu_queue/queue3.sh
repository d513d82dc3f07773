#!/bin/bash
# Follow-on TPU jobs: MaHopper validation runs (ISAC + MASAC at reference defaults).
cd /root/repo
Q=/root/repo/results/r2_queue

# Feature validations first (cheap, high information) — idempotent.
bash $Q/queue6.sh

echo "=== job6: ISAC MaHopper (reference defaults) $(date)"
timeout 3000 python -m mava_tpu.systems.sac.ff_isac env=mahopper \
  system.total_timesteps=300000 arch.num_envs=64 arch.num_evaluation=30 \
  logger.use_json=True > $Q/job6_isac_mahopper.log 2>&1
echo "job6 exit=$? $(date)"

echo "=== job7: MASAC MaHopper (reference defaults) $(date)"
timeout 3000 python -m mava_tpu.systems.sac.ff_masac env=mahopper \
  system.total_timesteps=300000 arch.num_envs=64 arch.num_evaluation=30 \
  logger.use_json=True > $Q/job7_masac_mahopper.log 2>&1
echo "job7 exit=$? $(date)"
echo "=== queue3 done $(date)"

echo "=== job8: ISAC MaCheetah (reference defaults) $(date)"
timeout 3000 python -m mava_tpu.systems.sac.ff_isac env=macheetah \
  system.total_timesteps=300000 arch.num_envs=64 arch.num_evaluation=30 \
  logger.use_json=True > $Q/job8_isac_macheetah.log 2>&1
echo "job8 exit=$? $(date)"
echo "=== queue3 done(2) $(date)"
