"""Decompose ONE rec-IQL train epoch: replay gather vs stacked fwd vs grad.

j030 (round 4) pins the fused step at ~235 ms with train = 96.5% (~113 ms per
epoch), and j010 shows removing one of three full-length GRU scans moves the
step only ~5% — so the epoch is NOT scan-dominated. This isolates the three
candidate costs, each as its own shard_mapped compiled program scanned over
EPOCHS iterations (amortising dispatch), in ONE process:

  sample       — rb.sample gather only (32 sequences x 21 steps from the
                 (64-env, 5000-step) ring buffer pytree)
  sample+fwd   — + the fused stacked online/target get_q_values pass
  sample+grad  — + the q_loss_fn grad pass (squared-Q loss)

Usage: python scripts/profile_iql_train_parts.py [timed_calls]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from mava_tpu.networks import ScannedRNN
from mava_tpu.parallel import DATA_AXIS, build_learner, make_mesh, num_learner_devices
from mava_tpu.systems.q_learning import rec_iql
from mava_tpu.utils.config import load_config
from mava_tpu.utils.jax_utils import select_along_last, switch_leading_axes

NUM_ENVS = 64
EPOCHS = 64  # scan length per timed call


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    cfg = load_config(
        "default_rec_iql",
        [
            "env=smax",
            "env/scenario=2s3z",
            f"arch.num_envs={NUM_ENVS}",
            "logger.use_console=False",
        ],
    )
    mesh = make_mesh()
    cfg.arch.n_devices = num_learner_devices(mesh)
    cfg.system.scan_steps = 4
    (env, _), q_net, opt, rb, state, _ = rec_iql.init(cfg, mesh)

    # Fill the buffer with a few real fused steps first.
    update = rec_iql.build_learn_fn(cfg, env, q_net, opt, rb, mesh, state.buffer_state)
    state, _ = update(state)
    jax.block_until_ready(state)

    specs = rec_iql._state_specs(state.buffer_state)
    B = cfg.system.sample_batch_size
    H = cfg.network.hidden_state_dim

    def prep(obs, term_or_trunc):
        hidden_state = ScannedRNN.initialize_carry((B, obs.agents_view.shape[2]), H)
        return hidden_state, (
            switch_leading_axes(obs),
            switch_leading_axes(term_or_trunc),
        )

    def make_part(kind):
        def part(buffer_state, params, keys):
            def body(key, _):
                key, sk = jax.random.split(key)
                data = rb.sample(buffer_state, sk).experience
                data_first = jax.tree.map(lambda x: x[:, :-1, ...], data)
                if kind == "sample":
                    acc = jnp.sum(data_first.reward)
                elif kind == "fwd":
                    hidden_state, next_inputs = prep(
                        data_first.next_obs,
                        jax.tree.map(lambda x: x[:, 1:, ...], data).term_or_trunc,
                    )
                    stacked = jax.tree.map(
                        lambda o, t: jnp.stack([o, t]),
                        params.online,
                        params.target,
                    )
                    _, q_both = jax.vmap(
                        lambda p: q_net.apply(
                            p, hidden_state, next_inputs, method="get_q_values"
                        )
                    )(stacked)
                    acc = jnp.sum(q_both)
                else:  # grad
                    hidden_state, inputs = prep(
                        data_first.obs, data_first.term_or_trunc
                    )

                    def loss_fn(p):
                        _, q = q_net.apply(
                            p, hidden_state, inputs, method="get_q_values"
                        )
                        q = switch_leading_axes(q)
                        q = select_along_last(q, data_first.action)
                        return jnp.mean(jnp.square(q))

                    g = jax.grad(loss_fn)(params.online)
                    acc = sum(
                        jnp.sum(jnp.abs(leaf)) for leaf in jax.tree.leaves(g)
                    )
                return key, acc

            _, accs = jax.lax.scan(body, keys[0], None, length=EPOCHS)
            return jax.lax.pmean(jnp.sum(accs), DATA_AXIS)

        return part

    results = {}
    for kind in ("sample", "fwd", "grad"):
        fn = build_learner(
            make_part(kind),
            mesh,
            in_specs=(specs.buffer_state, P(), P(DATA_AXIS)),
            out_specs=P(),
        )
        keys = jax.random.split(jax.random.PRNGKey(7), cfg.arch.n_devices)
        out = fn(state.buffer_state, state.params, keys)
        jax.block_until_ready(out)
        start = time.perf_counter()
        for _ in range(n):
            out = fn(state.buffer_state, state.params, keys)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - start) / n
        results[kind] = {"ms_per_epoch": dt * 1e3 / EPOCHS}
        print(f"{kind}: {dt*1e3/EPOCHS:.3f} ms/epoch", flush=True)

    print(json.dumps({"iql_train_parts": results, "epochs_per_call": EPOCHS}))


if __name__ == "__main__":
    main()
