"""Learning-rate / entropy schedules (reference `mava/utils/training.py:20-64`)."""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Union

import chex
import jax
import jax.numpy as jnp
import optax


def make_learning_rate_schedule(init_lr: float, config) -> Callable[[int], float]:
    """Linear decay to zero over every minibatch update of the run."""
    total_updates = (
        config.system.ppo_epochs
        * config.system.num_minibatches
        * config.system.num_updates
    )

    def linear_schedule(count: int) -> float:
        # Clamped at zero: past the planned horizon (misconfigured num_updates
        # or extended runs) the lr holds at 0 instead of going NEGATIVE and
        # turning every update into gradient ascent.
        frac = jnp.maximum(0.0, 1.0 - count / total_updates)
        return init_lr * frac

    return linear_schedule


def make_learning_rate(init_lr: float, config) -> Union[float, Callable[[int], float]]:
    if config.system.get("decay_learning_rates", False):
        return make_learning_rate_schedule(init_lr, config)
    return init_lr


def entropy_coefficient(config, actor_opt_state):
    """PPO entropy coefficient — constant `system.ent_coef` by default; if
    `system.ent_coef_final` is set, linearly annealed from `ent_coef` to it over
    every minibatch update of the run.

    The schedule position is read from the Adam step count already carried in the
    actor optimizer state, so no extra counter enters the learner state (and the
    anneal is exact under any num_updates_per_eval chunking). High-early /
    low-late entropy is the standard exploration schedule for sparse-reward maps
    (e.g. SMAX 3s_vs_5z) where a fixed coefficient either kills convergence (too
    high) or exploration (too low). Extends the reference (fixed `ent_coef`,
    `mava/systems/ppo/anakin/rec_ippo.py` loss) behind a default-off knob.
    """
    init = config.system.ent_coef
    final = config.system.get("ent_coef_final", None)
    if final is None:
        return init
    total = (
        config.system.ppo_epochs
        * config.system.num_minibatches
        * config.system.num_updates
    )
    # With decay_learning_rates the optimizer is adam(schedule), whose chain
    # carries TWO 'count' leaves (ScaleByAdamState + ScaleByScheduleState) and
    # tree_get raises on the ambiguity. Both counters tick once per update, so
    # take the first match (regression test: tests/test_losses.py).
    found = optax.tree_utils.tree_get_all_with_path(actor_opt_state, "count")
    count = found[0][1]
    frac = jnp.minimum(count / total, 1.0)
    return init + (final - init) * frac


def make_optimizer(lr, max_grad_norm: float) -> optax.GradientTransformation:
    """Global-norm-clipped Adam with eps=1e-5 (the reference's exact optimizer,
    `ff_ippo.py:375-382` — eps matters for curve matching)."""
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adam(lr, eps=1e-5),
    )


class SweptLrState(NamedTuple):
    """State of `scale_by_swept_lr`. `steps` mirrors Adam's count; `peak_lr` is
    the TRACED peak learning rate — set it per sweep entry with
    `optax.tree_utils.tree_set(opt_state, peak_lr=...)` and `jax.vmap` the stock
    update over a stacked state to train many learning rates in one program.
    (Named `steps`, not `count`, to stay distinguishable from Adam's counter
    in `tree_get`-style state queries.)"""

    steps: chex.Array
    peak_lr: chex.Array


def scale_by_swept_lr(
    decay: bool, total_updates: int
) -> optax.GradientTransformation:
    """Final-scale step of Adam with the peak lr read from STATE instead of a
    Python closure. Bit-compatible with optax's `scale(-lr)` (constant lr) and
    `scale_by_schedule` over `make_learning_rate_schedule` (decay): the same
    `frac`/multiply sequence, so a swept entry reproduces the stock optimizer's
    float-for-float update stream (tested in tests/test_vmap_sweep.py)."""

    def init_fn(params):
        del params
        return SweptLrState(
            steps=jnp.zeros([], jnp.int32), peak_lr=jnp.zeros([], jnp.float32)
        )

    def update_fn(updates, state, params=None):
        del params
        if decay:
            # Same clamped-at-zero linear decay as make_learning_rate_schedule
            # (bit-compat is tested in tests/test_vmap_sweep.py).
            frac = jnp.maximum(0.0, 1.0 - state.steps / total_updates)
            lr = state.peak_lr * frac
        else:
            lr = state.peak_lr
        updates = jax.tree.map(lambda u: u * -lr, updates)
        return updates, SweptLrState(steps=state.steps + 1, peak_lr=state.peak_lr)

    return optax.GradientTransformation(init_fn, update_fn)


def make_swept_optimizer(config, max_grad_norm: float) -> optax.GradientTransformation:
    """`make_optimizer` with the lr moved into optimizer state: clip →
    scale_by_adam(eps=1e-5) → scale_by_swept_lr. `optax.adam(lr)` IS
    `scale_by_adam` followed by a `-lr` scale, so the math is identical — the
    peak just arrives via `set_peak_lr` rather than a closure, which makes it a
    legal vmap axis for one-program hyperparameter sweeps."""
    decay = bool(config.system.get("decay_learning_rates", False))
    total_updates = (
        config.system.ppo_epochs
        * config.system.num_minibatches
        * config.system.num_updates
    )
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.scale_by_adam(eps=1e-5),
        scale_by_swept_lr(decay, total_updates),
    )


def set_peak_lr(opt_state, peak_lr) -> Any:
    """Return `opt_state` with its SweptLrState.peak_lr leaf replaced (shape
    must match — scalar for one entry, (S,) for a vmapped stack)."""
    return optax.tree_utils.tree_set(
        opt_state, peak_lr=jnp.asarray(peak_lr, jnp.float32)
    )


def make_swept_adam(
    lr: float, max_grad_norm: float, eps: float = 1e-8
) -> optax.GradientTransformation:
    """Generic (non-PPO-schedule) swept clipped Adam: clip → scale_by_adam(eps)
    → constant scale_by_swept_lr, with `lr` written into the state at init.
    Math-identical to `chain(clip_by_global_norm, adam(lr, eps))` — the SAC
    family's optimizer (`ff_isac.py`) — but with the lr as a traced state leaf,
    so stacked per-entry inits + vmap give a one-program lr sweep."""
    opt = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.scale_by_adam(eps=eps),
        scale_by_swept_lr(decay=False, total_updates=1),
    )

    def init_fn(params):
        return set_peak_lr(opt.init(params), lr)

    return optax.GradientTransformation(init_fn, opt.update)


# Loss-info keys that carry mean Q-value estimates across the off-policy
# systems (SAC: q{1,2}_a_vals, rec-IQL: mean_q / mean_target).
_Q_MAGNITUDE_KEYS = ("q1_a_vals", "q2_a_vals", "mean_q", "mean_target")


def warn_q_divergence(
    loss_info: dict, bound: float, system_name: str = "off-policy system"
) -> bool:
    """Host-side guardrail for the off-policy Q-divergence failure mode.

    SAC/MASAC (and any bootstrapped Q-learner) can diverge silently when the
    reward scale and update density interact badly: the measured case is
    ff-MASAC on MaSwarm at epochs=32, where Q estimates run away to +10k while
    training "succeeds" (BASELINE.md parity notes; fixed with
    system.reward_scale=0.1 — queue row j200). This checks the already-logged
    mean-Q magnitudes against `bound` (config: system.q_divergence_warn_bound)
    and emits an actionable runtime warning instead of leaving the failure to
    be discovered in a return plot. Returns True iff the warning fired.

    Zero device cost: operates on host-side loss metrics after the step.
    """
    import warnings

    import numpy as np

    worst_key, worst = None, 0.0
    for key in _Q_MAGNITUDE_KEYS:
        if key in loss_info:
            mag = float(np.max(np.abs(np.asarray(jax.device_get(loss_info[key])))))
            # NaN is the TERMINAL state of the divergence this guards (inf-inf
            # in the TD math) — treat it as worse than any finite magnitude.
            if np.isnan(mag):
                mag = float("inf")
            if mag > worst:
                worst_key, worst = key, mag
    if worst_key is not None and worst > bound:
        warnings.warn(
            f"{system_name}: |{worst_key}| reached {worst:.3g} "
            f"(> system.q_divergence_warn_bound={bound:g}) — the Q estimates "
            "are likely diverging. Known fix for reward-dense tasks "
            "(e.g. MaSwarm at high epochs): lower system.reward_scale "
            "(0.1 validated on hardware, BASELINE.md j200) or reduce "
            "system.epochs.",
            stacklevel=2,
        )
        return True
    return False
