#!/bin/bash
# Throughput-vs-env-count curve (the reference's speed-plot protocol,
# README.md:131-144 / mava_sps_results.png) at the r4 unroll default.
cd /root/repo
timeout 6000 python scripts/bench_envs_sweep.py 10
