#!/bin/bash
# PBT validation runs on the real chip (the "follow-on once sweep numbers
# land" item from BASELINE.md's round-2 table). Launched by waiter7.sh after
# the master queue drains; assumes tunnel up.
#
# Round-3 postmortem of the first drain: job19 crashed with
# KeyError: 'win_rate' on BOTH attempts — rec_ippo_pbt ranked members by the
# config's metric NAME while the evaluator returns 'won_episode'
# (fixed in advanced_usage/ff_ippo_pbt.py:resolve_rank_metric; regression
# tests in tests/test_pbt.py). The old job19b retry assumed vmap-over-pallas
# was the failure mode and retried with gru_impl=hoisted, which failed
# identically — that retry is removed. Per-job .done markers are only written
# on exit 0 so failed jobs rerun on the next drain.
cd /root/repo
# Legacy r2 queue script, kept as the rerun recipe; its jobs were re-executed
# in the r3 queue (j040/j050/j055). mkdir so it also runs on a fresh container
# where results/r2_queue no longer exists.
Q=/root/repo/results/r2_queue
mkdir -p "$Q"

if [ ! -f $Q/job18.done ]; then
  echo "=== job18: ff-IPPO PBT (pop 8) on RWARE tiny-2ag $(date)"
  timeout 3000 python -m mava_tpu.advanced_usage.ff_ippo_pbt \
    env=rware env/scenario=tiny-2ag arch.num_envs=64 \
    system.total_timesteps=4000000 arch.num_evaluation=20 \
    '+system.pbt_population=8' '+system.pbt_lr_range=[5e-5, 5e-3]' \
    logger.use_console=False > $Q/job18_ff_pbt.log 2>&1
  rc=$?
  echo "job18 exit=$rc $(date)"
  [ "$rc" = 0 ] && touch $Q/job18.done
else
  echo 'job18 already ran'
fi

if [ ! -f $Q/job19.done ]; then
  echo "=== job19: rec-IPPO PBT (pop 4) on SMAX 2s3z $(date)"
  timeout 3000 python -m mava_tpu.advanced_usage.rec_ippo_pbt \
    env=smax env/scenario=2s3z network=rnn arch.num_envs=32 \
    system.recurrent_chunk_size=16 system.total_timesteps=2000000 \
    arch.num_evaluation=10 \
    '+system.pbt_population=4' '+system.pbt_lr_range=[5e-5, 5e-3]' \
    logger.use_console=False > $Q/job19_rec_pbt.log 2>&1
  rc=$?
  echo "job19 exit=$rc $(date)"
  [ "$rc" = 0 ] && touch $Q/job19.done
else
  echo 'job19 already ran'
fi

echo "=== queue7 pass complete $(date)"
