#!/bin/bash
# PBT validation runs on the real chip (the "follow-on once sweep numbers
# land" item from BASELINE.md's round-2 table). Launched by waiter7.sh after
# the master queue drains; assumes tunnel up. Idempotent.
cd /root/repo
Q=/root/repo/results/r2_queue
if [ -f $Q/queue7.done ]; then echo 'queue7 already ran'; exit 0; fi

echo "=== job18: ff-IPPO PBT (pop 8) on RWARE tiny-2ag $(date)"
timeout 3000 python -m mava_tpu.advanced_usage.ff_ippo_pbt \
  env=rware env/scenario=tiny-2ag arch.num_envs=64 \
  system.total_timesteps=4000000 arch.num_evaluation=20 \
  '+system.pbt_population=8' '+system.pbt_lr_range=[5e-5, 5e-3]' \
  logger.use_console=False > $Q/job18_ff_pbt.log 2>&1
echo "job18 exit=$? $(date)"

echo "=== job19: rec-IPPO PBT (pop 4) on SMAX 2s3z $(date)"
timeout 3000 python -m mava_tpu.advanced_usage.rec_ippo_pbt \
  env=smax env/scenario=2s3z network=rnn arch.num_envs=32 \
  system.recurrent_chunk_size=16 system.total_timesteps=2000000 \
  arch.num_evaluation=10 \
  '+system.pbt_population=4' '+system.pbt_lr_range=[5e-5, 5e-3]' \
  logger.use_console=False > $Q/job19_rec_pbt.log 2>&1
rc=$?
echo "job19 exit=$rc $(date)"
if [ "$rc" != 0 ]; then
  # gru_impl=auto resolves to the Pallas kernel on TPU; if vmap-over-pallas
  # (population axis) is the failure, retry on the hoisted scan.
  echo "=== job19b: retry with gru_impl=hoisted $(date)"
  timeout 3000 python -m mava_tpu.advanced_usage.rec_ippo_pbt \
    env=smax env/scenario=2s3z network=rnn network.gru_impl=hoisted \
    arch.num_envs=32 system.recurrent_chunk_size=16 \
    system.total_timesteps=2000000 arch.num_evaluation=10 \
    '+system.pbt_population=4' '+system.pbt_lr_range=[5e-5, 5e-3]' \
    logger.use_console=False > $Q/job19b_rec_pbt_hoisted.log 2>&1
  echo "job19b exit=$? $(date)"
fi
touch $Q/queue7.done
echo "=== queue7 done $(date)"
