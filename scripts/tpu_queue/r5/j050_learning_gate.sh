#!/bin/bash
# VERDICT r5 item-3: the CPU learning-threshold regression gate, run once per
# round on the validation box (opt-in in the suite; measured discrimination:
# ff-IPPO Penalty 18.6 correct vs -155 flipped-GAE vs -31 random).
cd /root/repo
timeout 3000 make test-learning
