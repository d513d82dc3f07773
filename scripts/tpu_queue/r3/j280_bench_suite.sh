#!/bin/bash
# Refresh the multi-config throughput table on the current build (README /
# BASELINE evidence freshness after the round-3 changes).
cd /root/repo
timeout 3600 python scripts/bench_suite.py
