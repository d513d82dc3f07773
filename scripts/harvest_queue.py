"""Summarise TPU queue logs (r2 or r3 layout) for BASELINE.md recording.

For every job log in results/r2_queue: print the exit status (from the queue
runner logs), any JSON result lines, and the final eval/return lines — the
bits that go into BASELINE.md / docs/tpu_performance.md.

Usage: python scripts/harvest_queue.py [queue_dir]
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

QDIR = Path(sys.argv[1] if len(sys.argv) > 1 else "results/r2_queue")

INTERESTING = re.compile(
    r"(final eval|absolute|win_rate|episode_return|steps_per_second|"
    r"PBT final|vmap-sweep|vmap-seeds|experiment completed)",
    re.IGNORECASE,
)


def main() -> None:
    exits = {}
    for runner in sorted(QDIR.glob("*.log")):
        if not runner.name.startswith(("queue", "master", "waiter", "runner")):
            continue
        for line in runner.read_text(errors="replace").splitlines():
            m = re.search(r"=== (j\w+) exit=(\d+)|^(job\w+) exit=(\d+)", line)
            if m:
                name = m.group(1) or m.group(3)
                exits[name] = int(m.group(2) or m.group(4))

    for log in sorted(QDIR.glob("job*.log")) + sorted(QDIR.glob("j[0-9]*.log")):
        job = log.name.split("_")[0] if log.name.startswith("job") else log.stem
        status = exits.get(job, "?")
        print(f"\n=== {log.name} (exit={status}) " + "=" * 30)
        lines = log.read_text(errors="replace").splitlines()
        json_lines = [ln for ln in lines if ln.startswith("{") and ln.endswith("}")]
        for ln in json_lines[-3:]:
            try:
                print("  JSON:", json.dumps(json.loads(ln)))
            except json.JSONDecodeError:
                pass
        hits = [ln for ln in lines if INTERESTING.search(ln)]
        for ln in hits[-8:]:
            print("  ", ln.strip()[:200])
        if not json_lines and not hits:
            for ln in lines[-5:]:
                print("  tail:", ln.strip()[:200])


if __name__ == "__main__":
    main()
