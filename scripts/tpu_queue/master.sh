#!/bin/bash
# Master round-2 TPU queue: probe tunnel (up to ~10h), then run all queues serially.
cd /root/repo
Q=/root/repo/results/r2_queue

echo "=== master probing tunnel $(date)"
up=0
for i in $(seq 1 300); do
  if timeout 120 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then
    echo "tunnel up after $i probes $(date)"; up=1; break
  fi
  sleep 110
done
if [ "$up" != 1 ]; then echo "tunnel never recovered $(date)"; exit 1; fi

# queue2 has its own (shorter) probe loop at the top; it will pass instantly now.
bash $Q/queue2.sh
echo "=== master chaining into queue3 $(date)"
bash $Q/queue3.sh
echo "=== master chaining into queue4 $(date)"
bash $Q/queue4.sh
echo "=== master chaining into queue5 $(date)"
bash $Q/queue5.sh
echo "=== master all queues done $(date)"
