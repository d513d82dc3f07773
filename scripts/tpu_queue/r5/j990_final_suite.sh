#!/bin/bash
# Final full suite at the round-5 closing HEAD (code changes since j900:
# seed-runner per_seed init, buffer-experience helpers + their tests, docs).
cd /root/repo
timeout 7200 make test
