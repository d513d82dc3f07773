"""REAL multi-process `jax.distributed` smoke test — the FULL loop.

Round 2 proved the multi-host placement math with monkeypatched process
counts (`tests/test_distributed.py`); round 3 executed ONE train step for
real; round 4 (VERDICT r3 #3) extends the executed surface to the whole run
loop: two OS processes, a localhost coordinator, 4 virtual CPU devices each
-> one global 8-device mesh, driving under `jax.process_count() == 2`:

  * `distributed.initialize()` + `sharded_env_reset` + the shard_mapped
    ff-IPPO learner (`jax.make_array_from_process_local_data` + the
    cross-process collective path, the DCN analogue);
  * `MavaLogger` on BOTH processes (backends on process 0 only, asserted)
    including a log of the cross-process-sharded EVAL metrics (the
    process_allgather path in `MavaLogger.log`);
  * one `get_eval_fn` evaluation over the global mesh;
  * a `Checkpointer.save(full_state=True)` -> `restore_full_state` ->
    continue-one-step round trip (the orbax multi-host path, with global
    jax.Arrays handed over by `multihost_safe_state`).

Pass criterion: train metrics, param checksum, eval return/episode-count and
the post-restore continuation checksum all match a single-process 8-device
control run of the same program (tolerance 1e-5 — cross-process all-reduce
ordering may differ from the in-process reduction, so bit-exactness is not
guaranteed on CPU gloo).

Usage:
    python scripts/multiproc_smoke.py            # parent: runs control + both workers
    (workers are spawned internally with --process-id)

Single-process-by-design contrast: reference `mava/systems/ppo/ff_ippo.py:354`.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Scratch checkpoint dir shared by the worker processes (same host filesystem,
# the pod-slice shared-storage analogue); the parent wipes it between runs.
CKPT_REL_DIR = "results/tmp_multiproc_ckpt"

TINY_OVERRIDES = [
    "env=rware",
    "env/scenario=tiny-2ag",
    "env.kwargs.time_limit=8",
    "arch.num_envs=2",
    "system.rollout_length=4",
    "system.num_updates=1",
    "arch.num_evaluation=1",
    # NOT a multiple of the 8 global devices: the evaluator's round-up path
    # must agree across 1/2/4-process layouts (VERDICT r4 next-8).
    "arch.num_eval_episodes=30",
    "+system.ppo_epochs=1",
    "+system.num_minibatches=2",
    "logger.use_console=False",
]


def worker(num_processes: int, process_id: int, port: int) -> None:
    """Build the tiny ff-IPPO learner on the global mesh and run one step."""
    # Backend setup must precede any jax import side effects: 4 virtual CPU
    # devices per process (8 global with 2 processes), platform selected
    # in-process (the JAX_PLATFORMS env var hangs with the TPU tunnel plugin —
    # CLAUDE.md), and no shared compilation cache (two one-core processes
    # compiling the same program would race the cache writer).
    import jax

    jax.config.update("jax_platforms", "cpu")

    from mava_tpu.parallel import distributed

    if num_processes > 1:
        distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=num_processes,
            process_id=process_id,
        )
        assert jax.process_count() == num_processes, jax.process_count()

    import numpy as np

    from mava_tpu import envs as environments
    from mava_tpu.evaluator import get_eval_fn, make_ff_eval_act_fn
    from mava_tpu.parallel import make_mesh, num_learner_devices
    from mava_tpu.systems.ppo.ff_ippo import learner_setup
    from mava_tpu.utils.checkpointing import Checkpointer, multihost_safe_state
    from mava_tpu.utils.config import load_config
    from mava_tpu.utils.logger import LogEvent, MavaLogger

    assert len(jax.devices()) == 8, jax.devices()

    cfg = load_config("default_ff_ippo", list(TINY_OVERRIDES))
    mesh = make_mesh()
    cfg.arch.n_devices = num_learner_devices(mesh)
    cfg.system.num_updates = 1
    cfg.system.num_updates_per_eval = 1

    env, eval_env = environments.make(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    learn, actor_network, learner_state = learner_setup(env, tuple(keys), cfg, mesh)

    out = learn(learner_state)
    jax.block_until_ready(out)

    # Replicated outputs: every process holds the full value in its local shard.
    def rep(x):
        return np.asarray(x.addressable_data(0))

    def checksum(tree):
        return float(
            sum(np.abs(rep(leaf)).sum() for leaf in jax.tree.leaves(tree))
        )

    train_metrics = {
        k: float(np.mean(rep(v))) for k, v in out.train_metrics.items()
    }
    param_checksum = checksum(out.learner_state.params)

    # ---- episode-metrics masking on cross-process sharded arrays ----
    # (get_final_step_metrics gathers first in multi-process mode; the boolean
    # mask would otherwise raise on non-addressable shards)
    from mava_tpu.envs.wrappers import get_final_step_metrics

    final_metrics, ep_completed = get_final_step_metrics(
        dict(out.episode_metrics)
    )
    episode_count = (
        int(np.asarray(final_metrics["episode_return"]).size) if ep_completed else 0
    )

    # ---- logger on BOTH processes: backends exist only on process 0 ----
    cfg.logger.use_console = True
    logger = MavaLogger(cfg)
    n_backends = len(logger.logger.loggers)
    if jax.process_index() == 0:
        assert n_backends >= 1, "process 0 must own logging backends"
    else:
        assert n_backends == 0, (
            f"process {jax.process_index()} must be a logging no-op, "
            f"got {n_backends} backends"
        )
    logger.log({"param_checksum": param_checksum}, 64, 0, LogEvent.MISC)

    # ---- evaluator over the GLOBAL mesh (params replicated, per-shard envs) ----
    eval_act_fn = make_ff_eval_act_fn(actor_network.apply, cfg)
    evaluator = get_eval_fn(eval_env, eval_act_fn, cfg, mesh, absolute_metric=False)
    eval_metrics = evaluator(
        out.learner_state.params.actor_params, jax.random.PRNGKey(42), {}
    )
    # Reductions over cross-process sharded metrics must be COMPUTATIONS
    # (every process runs them), not host fetches.
    import jax.numpy as jnp

    eval_return = float(jnp.mean(eval_metrics["episode_return"]))
    eval_episodes = int(eval_metrics["episode_length"].shape[0])
    # The logger path over the sharded eval metrics (process_allgather inside
    # MavaLogger.log; console backend on process 0 only).
    logger.log(dict(eval_metrics), 64, 0, LogEvent.EVAL)

    # ---- checkpoint: save(full_state) -> restore -> continue one step ----
    # (the orbax multi-host path: every process participates; global jax.Arrays
    # are handed over as-is by multihost_safe_state)
    # Default-uid path first: without an explicit checkpoint_uid every process
    # must still agree on the directory (process-0 timestamp broadcast in
    # Checkpointer.__init__) or the orbax collective save never commits.
    uid_probe = Checkpointer(model_name="uid_sync_check", rel_dir=CKPT_REL_DIR)
    default_uid = os.path.basename(uid_probe.directory)
    uid_probe.close()

    ckpt = Checkpointer(
        model_name="multiproc_smoke",
        rel_dir=CKPT_REL_DIR,
        checkpoint_uid=f"np{num_processes}",
    )
    saved = ckpt.save(
        timestep=64,
        unreplicated_learner_state=multihost_safe_state(out.learner_state),
        episode_return=eval_return,
        full_state=True,
    )
    assert saved, "checkpoint save did not commit"
    ckpt._manager.wait_until_finished()
    restored = ckpt.restore_full_state(multihost_safe_state(out.learner_state))
    ckpt.close()
    restored_state = jax.tree.map(
        lambda t, x: jax.device_put(x, t.sharding), out.learner_state, restored
    )
    # Restored params must equal the saved ones exactly.
    assert abs(checksum(restored_state.params) - param_checksum) == 0.0

    out2 = learn(restored_state)
    jax.block_until_ready(out2)
    resumed_checksum = checksum(out2.learner_state.params)

    result = {
        "process_count": jax.process_count(),
        "process_id": jax.process_index(),
        "n_global_devices": len(jax.devices()),
        "train_metrics": train_metrics,
        "param_checksum": param_checksum,
        "episode_count": episode_count,
        "eval_return": eval_return,
        "eval_episodes": eval_episodes,
        "resumed_checksum": resumed_checksum,
        "default_ckpt_uid": default_uid,
    }
    print("SMOKE_RESULT " + json.dumps(result), flush=True)


def spawn(num_processes: int, process_id: int, port: int, devices: int):
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = f"{flags} --xla_force_host_platform_device_count={devices}"
    env["MAVA_TPU_NO_COMPILATION_CACHE"] = "1"
    # sys.path[0] for a script run by absolute path is scripts/, not the repo
    # root — the worker needs the package importable explicitly.
    prev_pp = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = f"{REPO}:{prev_pp}" if prev_pp else REPO
    return subprocess.Popen(
        [
            sys.executable,
            os.path.abspath(__file__),
            "--worker",
            f"--num-processes={num_processes}",
            f"--process-id={process_id}",
            f"--port={port}",
        ],
        env=env,
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )


def parse_result(output: str) -> dict:
    for line in output.splitlines():
        if line.startswith("SMOKE_RESULT "):
            return json.loads(line[len("SMOKE_RESULT "):])
    raise RuntimeError(f"no SMOKE_RESULT in output:\n{output}")


def run_phase(num_processes: int, port: int) -> dict:
    """Spawn `num_processes` workers (8 // np devices each), rendezvous them at
    a localhost coordinator, and return process 0's parsed result after
    asserting all workers exit 0 and agree on the default checkpoint uid."""
    devices = 8 // num_processes
    print(f"=== multiproc: {num_processes} processes x {devices} devices", flush=True)
    procs = [spawn(num_processes, i, port, devices) for i in range(num_processes)]
    # Drain all pipes concurrently: a worker blocking on a full stdout pipe
    # would stall the cross-process collective and hang its peers.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=num_processes) as pool:
        futs = [pool.submit(p.communicate, None, 3600) for p in procs]
        outs = [f.result()[0] for f in futs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker{i}/{num_processes} failed:\n{out}"
    results = [parse_result(o) for o in outs]
    print(json.dumps(results[0]), flush=True)
    assert results[0]["process_count"] == num_processes, results[0]
    # Default-uid checkpoint directories must agree ACROSS processes (the
    # process-0 timestamp broadcast), or orbax's collective save desyncs.
    uids = {r["default_ckpt_uid"] for r in results}
    assert len(uids) == 1, f"default checkpoint uid disagrees across processes: {uids}"
    return results[0]


def compare_to_control(control: dict, multi: dict) -> bool:
    """Same global program => same losses/params/eval/resume (tolerance:
    cross-process collective reduction order)."""
    import math

    ok = True
    for k, v in control["train_metrics"].items():
        mv = multi["train_metrics"][k]
        close = math.isclose(v, mv, rel_tol=1e-5, abs_tol=1e-6)
        print(f"{k}: control={v:.8f} multi={mv:.8f} close={close}", flush=True)
        ok &= close
    # The full loop surface: params after train, eval through the global-mesh
    # evaluator, and params after a checkpoint save -> restore -> second step
    # (the orbax multi-host path) must all reproduce the single-process control.
    for k, rel in (
        ("param_checksum", 1e-5),
        ("episode_count", 0.0),
        ("eval_return", 1e-5),
        ("eval_episodes", 0.0),
        ("resumed_checksum", 1e-5),
    ):
        close = math.isclose(control[k], multi[k], rel_tol=rel, abs_tol=1e-6)
        print(
            f"{k}: control={control[k]:.6f} multi={multi[k]:.6f} close={close}",
            flush=True,
        )
        ok &= close
    return ok


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--port", type=int, default=43217)
    ap.add_argument(
        "--phases",
        default="2,4",
        help="comma-separated process counts to validate against the control "
        "(each with 8//np devices per process; VERDICT r4 next-8 adds 4x2, "
        "covering the put_sharded_rows process-major layout at ranks that "
        "don't divide the eval-episode request evenly)",
    )
    args = ap.parse_args()

    if args.worker:
        worker(args.num_processes, args.process_id, args.port)
        return

    import shutil

    shutil.rmtree(os.path.join(REPO, CKPT_REL_DIR), ignore_errors=True)

    # Control: ONE process, 8 virtual devices — the same global program.
    print("=== control: single process, 8 devices", flush=True)
    ctrl_proc = spawn(1, 0, args.port, devices=8)
    ctrl_out, _ = ctrl_proc.communicate(timeout=1800)
    assert ctrl_proc.returncode == 0, f"control failed:\n{ctrl_out}"
    control = parse_result(ctrl_out)
    print(json.dumps(control), flush=True)

    ok = True
    for i, np_ in enumerate(int(x) for x in args.phases.split(",")):
        multi = run_phase(np_, args.port + 1 + i)
        ok &= compare_to_control(control, multi)

    print(json.dumps({"multiproc_smoke": "PASS" if ok else "FAIL"}), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
