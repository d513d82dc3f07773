"""Microbench: permutation-gather cost vs row width on TPU.

Hypothesis: jnp.take over axis 0 with random indices is row-DMA bound; skinny rows
((N,) scalar leaves = 4B rows) are catastrophically slow, so packing the whole
transition pytree into ONE wide (N, F) buffer and gathering once should beat
per-leaf gathers.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N = 32768


def timeit(fn, *args, n=50):
    out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / n


def main():
    key = jax.random.PRNGKey(0)
    perm = jax.random.permutation(key, N)

    for width in (1, 2, 8, 32, 132, 264, 660):
        x = jnp.ones((N, width), jnp.float32)
        t = timeit(jax.jit(lambda x, p: jnp.take(x, p, axis=0)), x, perm)
        gb = 2 * x.size * 4 / 1e9
        print(f"take (N,{width:4d})      : {t*1e6:9.1f} us   {gb/t:7.1f} GB/s")

    x1 = jnp.ones((N,), jnp.float32)
    t = timeit(jax.jit(lambda x, p: jnp.take(x, p, axis=0)), x1, perm)
    print(f"take (N,) scalar     : {t*1e6:9.1f} us")

    # Simulated ff-IPPO transition pytree: scalar leaves + obs + mask.
    tree = {
        "done": jnp.ones((N, 2), jnp.bool_),
        "action": jnp.ones((N, 2), jnp.int32),
        "value": jnp.ones((N, 2), jnp.float32),
        "reward": jnp.ones((N, 2), jnp.float32),
        "log_prob": jnp.ones((N, 2), jnp.float32),
        "agents_view": jnp.ones((N, 2, 66), jnp.float32),
        "action_mask": jnp.ones((N, 2, 5), jnp.bool_),
        "step_count": jnp.ones((N, 2), jnp.int32),
        "advantages": jnp.ones((N, 2), jnp.float32),
        "targets": jnp.ones((N, 2), jnp.float32),
    }
    t = timeit(
        jax.jit(lambda tr, p: jax.tree.map(lambda x: jnp.take(x, p, axis=0), tr)),
        tree,
        perm,
    )
    print(f"per-leaf tree gather : {t*1e6:9.1f} us")

    # Packed: one f32 buffer (bool/int cast), gather once, unpack with slices.
    def pack_gather(tr, p):
        leaves = jax.tree.leaves(tr)
        flat = [jnp.reshape(l, (N, -1)).astype(jnp.float32) for l in leaves]
        packed = jnp.concatenate(flat, axis=1)
        packed = jnp.take(packed, p, axis=0)
        out = []
        off = 0
        for l in leaves:
            w = l.size // N
            out.append(
                jnp.reshape(packed[:, off : off + w], l.shape).astype(l.dtype)
            )
            off += w
        return out

    t = timeit(jax.jit(pack_gather), tree, perm)
    print(f"packed gather        : {t*1e6:9.1f} us")

    # Sort-based alternative: sort by random keys instead of take with perm.
    def sort_shuffle(tr, k):
        r = jax.random.uniform(k, (N,))
        order = jnp.argsort(r)
        return jax.tree.map(lambda x: jnp.take(x, order, axis=0), tr)

    t = timeit(jax.jit(sort_shuffle), tree, key)
    print(f"argsort+per-leaf     : {t*1e6:9.1f} us")


if __name__ == "__main__":
    main()
