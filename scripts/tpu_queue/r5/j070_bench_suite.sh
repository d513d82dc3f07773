#!/bin/bash
# Multi-config throughput refresh at r5 HEAD (steady-state; r4 j956 rows were
# ff-IPPO 2.16M / ff-MAPPO rware-4ag 1.03M / LBF 3.20M / rec 297k/266k) —
# confirms the r5 changes (gae_impl threading, chunk_layout branch, logger
# rework) are HLO-neutral on the measured paths.
cd /root/repo
timeout 5400 python scripts/bench_suite.py
