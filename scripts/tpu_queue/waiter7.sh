#!/bin/bash
# Wait for the master queue (pid $1) to exit, then run queue7 (PBT validation).
while kill -0 "$1" 2>/dev/null; do sleep 60; done
bash /root/repo/results/r2_queue/queue7.sh
