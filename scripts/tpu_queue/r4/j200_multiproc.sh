#!/bin/bash
# Full-loop 2-process jax.distributed smoke (train + eval + logger gating +
# orbax multi-host checkpoint round trip) — VERDICT r3 #3/#7: runs once per
# round via the queue so regressions can't hide behind the env-var gate.
cd /root/repo
timeout 3600 make test-multiproc
