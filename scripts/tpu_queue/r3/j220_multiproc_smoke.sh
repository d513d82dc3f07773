#!/bin/bash
# Real 2-process jax.distributed smoke (VERDICT next-3) — CPU job, routed
# through the queue so its two concurrent compiles never overlap a TPU job
# on the one-core box.
cd /root/repo
timeout 3600 python scripts/multiproc_smoke.py
