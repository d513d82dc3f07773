#!/bin/bash
# Multi-config throughput refresh with the rollout_unroll=2 ff-PPO default
# (j280 r3 baseline rows: ff-IPPO 1.51M / ff-MAPPO 790k / LBF 2.04M /
# rec 190-194k).
cd /root/repo
timeout 4000 python scripts/bench_suite.py
