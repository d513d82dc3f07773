#!/bin/bash
# Rerun of j220 after the launcher fix: the worker subprocess is spawned by
# absolute script path, so sys.path[0] was scripts/ and `import mava_tpu`
# failed — spawn() now exports PYTHONPATH=<repo>. Pure-CPU job (virtual
# devices, jax.distributed over localhost); tiny shapes, cache disabled in
# the workers so the two concurrent compiles cannot race the cache writer.
cd /root/repo
timeout 3000 python scripts/multiproc_smoke.py
