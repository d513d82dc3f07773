#!/bin/bash
# Confirm the new headline with rollout_unroll=2 as the shipping default,
# through the official bench harness (j040 A/B measured 3.38M vs 2.97M).
cd /root/repo
timeout 2500 python bench.py
