#!/bin/bash
# Retry of j042 (bench with rollout_unroll=2 default): the first attempt's
# tunnel RPC hung during compile (exit 124 at 2500s with ~0 host CPU — a
# tunnel flake, not a compile cost; the identical-shape j040 variant compiled
# in ~3 min). Longer headroom.
cd /root/repo
timeout 3600 python bench.py
