"""Newton-d'Alembert dynamics for 3D point-cloud bodies (MaAnt, MaHumanoid).

For a body modelled purely as point masses at x_p = points(q) plus constant
rotor armatures, the Euler-Lagrange equations collapse to the point-mass
Newton-d'Alembert form

    M(q) qdd = J^T m (g - Jdot qd) + Q_applied
    M(q)     = J^T diag(m) J + diag(armature)

with J = d points / d q: the mass matrix comes from ONE forward Jacobian of
the plain kinematics, and gravity + every Coriolis/centrifugal term collapse
into the bias acceleration `Jdot qd` — two nested `jax.jvp`s. This is
algebraically IDENTICAL to the hessian-of-kinetic-energy Lagrangian path the
planar envs use (tests pin the equivalence), but the autodiff graph is ~4x
smaller: no hessian (forward-over-reverse), no jacfwd of the momentum, no
energy gradients. For the 23-DOF humanoid that is the difference between a
multi-minute XLA compile and a manageable one, and it makes M
positive-definite BY CONSTRUCTION (Gram matrix + positive diagonal).

The planar envs keep the Lagrangian form: their links carry explicit
rotational inertias (I*omega^2 terms), which the pure point-Newton form does
not represent; the 3D envs' point clouds encode rotational inertia
geometrically, so the collapse is exact there.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def newton_accel(
    points_fn: Callable[[jnp.ndarray], jnp.ndarray],
    point_masses: jnp.ndarray,
    armature_diag: jnp.ndarray,
    gravity: float,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    applied: jnp.ndarray,
) -> jnp.ndarray:
    """qdd for point-cloud dynamics; `applied` collects every generalized
    force EXCEPT gravity/inertial effects (motor torques, contact, damping,
    joint-limit springs)."""
    J = jax.jacfwd(points_fn)(q)  # (P, 3, n)
    mJ = point_masses[:, None, None] * J
    M = jnp.einsum("pin,pim->nm", mJ, J) + jnp.diag(armature_diag)

    # bias acceleration Jdot qd: second directional derivative of the kinematics
    vel_fn = lambda q_: jax.jvp(points_fn, (q_,), (qd,))[1]
    acc_bias = jax.jvp(vel_fn, (q,), (qd,))[1]  # (P, 3)

    g_vec = jnp.array([0.0, 0.0, -gravity])
    f_pts = point_masses[:, None] * (g_vec[None, :] - acc_bias)
    _, vjp = jax.vjp(points_fn, q)
    rhs = applied + vjp(f_pts)[0]
    return jnp.linalg.solve(M, rhs)
