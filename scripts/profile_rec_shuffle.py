"""Rec-PPO shuffle bisect: axis-1 per-leaf gather vs seq-major packed gather.

The rec epoch shuffle permutes SEQUENCES: leaves are (chunk, nseq, ...) and the
current code gathers with jnp.take(axis=1) per leaf. The packed alternative
transposes once to seq-major rows, packs to one (nseq, chunk*W) buffer, gathers
wide contiguous rows, and unpacks + transposes back per minibatch.

Measures the REAL rec-IPPO composition end-to-end on RWARE (cheap env so the
shuffle fraction is visible).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mava_tpu import envs as environments
from mava_tpu.parallel import make_mesh, num_learner_devices
from mava_tpu.systems.ppo.rec_ippo import learner_setup
from mava_tpu.utils.config import load_config

NUM_ENVS = 256
ROLLOUT = 128


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / n


def build(chunk):
    cfg = load_config(
        "default_rec_ippo",
        [
            f"arch.num_envs={NUM_ENVS}",
            f"system.rollout_length={ROLLOUT}",
            "logger.use_console=False",
        ],
    )
    mesh = make_mesh()
    cfg.arch.n_devices = num_learner_devices(mesh)
    cfg.system.num_updates = 128
    cfg.system.num_updates_per_eval = 1
    cfg.system.recurrent_chunk_size = chunk
    env, _ = environments.make(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    learn, _, state = learner_setup(env, tuple(keys), cfg, mesh)
    return learn, state


def main():
    for chunk in (16, 128):
        learn, state = build(chunk)
        t = timeit(lambda: learn(state))
        sps = ROLLOUT * NUM_ENVS / t
        print(f"rec-IPPO chunk={chunk:4d}: {t*1e3:8.2f} ms  ({sps:,.0f} steps/s)", flush=True)


if __name__ == "__main__":
    main()
