#!/bin/bash
# bench_suite rerun with the steady-state warmups bench.py has had since
# j056 (the single-warmup j955 read 15-37% under r3's rows).
cd /root/repo
timeout 4000 python scripts/bench_suite.py
