#!/bin/bash
# VERDICT r5 item-8: full-loop multi-process smoke, now 2x4 AND 4x2
# process/device layouts vs the single-process control (non-divisible
# eval-episode request, put_sharded_rows process-major layout at 4 ranks).
cd /root/repo
timeout 7200 make test-multiproc
