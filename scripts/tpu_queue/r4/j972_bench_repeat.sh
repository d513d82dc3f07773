#!/bin/bash
# Second independent-process repeat of the new 3.28M headline (j950); the
# driver's end-of-round bench.py run is the third — establishing the r4
# steady-state band like r3's j056/j360 pair.
cd /root/repo
timeout 3600 python bench.py
