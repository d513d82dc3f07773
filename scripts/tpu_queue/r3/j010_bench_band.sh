#!/bin/bash
# Headline bench jitter band (VERDICT r2 weak-2 / next-6): 3 in-process repeats.
cd /root/repo
timeout 2700 python scripts/bench_band.py 3
