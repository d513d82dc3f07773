#!/bin/bash
# Round-5 open: headline bench sanity + TPU-side cache warm (r4 band was
# 3.275-3.354M env-steps/s/chip at the rollout_unroll=2 default).
cd /root/repo
timeout 2500 python bench.py
