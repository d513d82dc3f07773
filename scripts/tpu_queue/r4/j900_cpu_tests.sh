#!/bin/bash
# Full suite on the 8-device virtual CPU mesh (cold per-host cache after the
# fingerprint change; allow generous time on the 1-core box).
cd /root/repo
timeout 7200 make test
