#!/bin/bash
# Headline bench sanity after the round-4 code changes (steady-state band
# was 2.96-2.98M steps/s in r3).
cd /root/repo
timeout 2500 python bench.py
