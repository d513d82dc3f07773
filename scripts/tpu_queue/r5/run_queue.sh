#!/bin/bash
# Serialized round-5 job runner (one-core box: EVERYTHING heavy goes through
# this queue — TPU jobs and CPU test batches alike — so no two jax processes
# ever compile concurrently; see CLAUDE.md).
#
# Scans scripts/tpu_queue/r5/j*.sh in lexical order, runs the first job with
# no marker, writes results/r5_queue/<job>.done on exit 0 or <job>.fail
# otherwise, then re-scans — so jobs can be appended while it runs. Failed
# jobs are NOT retried automatically (delete the .fail marker to rerun).
# Touch results/r5_queue/STOP to stop after the current job.
cd /root/repo || exit 1
J=/root/repo/scripts/tpu_queue/r5
Q=/root/repo/results/r5_queue
mkdir -p "$Q"

echo "=== r5 runner start $(date)"
# Tunnel probe: TPU jobs need the tunnel; don't burn job attempts while it's down.
for i in $(seq 1 30); do
  if timeout 120 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then
    echo "tunnel up after $i probes $(date)"; break
  fi
  if [ "$i" = 30 ]; then echo "WARNING: tunnel not up after 30 probes; running anyway $(date)"; fi
  sleep 60
done

idle=0
while true; do
  [ -f "$Q/STOP" ] && { echo "STOP requested $(date)"; break; }
  next=""
  for job in "$J"/j*.sh; do
    name=$(basename "$job" .sh)
    if [ ! -f "$Q/$name.done" ] && [ ! -f "$Q/$name.fail" ] && [ ! -f "$Q/$name.skip" ]; then
      next=$job; break
    fi
  done
  if [ -z "$next" ]; then
    idle=$((idle+1))
    [ $((idle % 10)) = 1 ] && echo "queue drained $(date); idling for appended jobs"
    sleep 60; continue
  fi
  idle=0
  name=$(basename "$next" .sh)
  echo "=== running $name $(date)"
  bash "$next" > "$Q/$name.log" 2>&1
  rc=$?
  echo "=== $name exit=$rc $(date)"
  if [ "$rc" = 0 ]; then touch "$Q/$name.done"; else touch "$Q/$name.fail"; fi
done
echo "=== r5 runner exit $(date)"
