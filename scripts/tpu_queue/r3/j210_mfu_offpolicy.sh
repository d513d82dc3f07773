#!/bin/bash
# MFU/roofline rows for the off-policy families (VERDICT next-4).
cd /root/repo
timeout 3600 python scripts/bench_mfu.py rec_iql_smax ff_isac_maswarm
