"""Opt-in wrapper for the real multi-process `jax.distributed` smoke run
(2x4 and 4x2 process/device layouts vs a single-process control).

Skipped by default: it spawns up to five concurrent jax processes (a control,
then 2- and 4-worker phases) which is expensive on the one-core CI box and
must not overlap other compiles (CLAUDE.md). Run with:

    RUN_MULTIPROC_SMOKE=1 python -m pytest tests/test_multiproc_smoke.py -s

The stub-based placement-math tests live in tests/test_distributed.py; this
is the executed-evidence counterpart (jax.process_count() in {2, 4} for real).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    not os.environ.get("RUN_MULTIPROC_SMOKE"),
    reason="opt-in (RUN_MULTIPROC_SMOKE=1): spawns 3 jax processes",
)
def test_multiproc_smoke_matches_single_process():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multiproc_smoke.py")],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert '"multiproc_smoke": "PASS"' in proc.stdout
