"""Task-space controllers.

``osc_torques`` mirrors the fork's per-arm operational-space controller
(``franka_reach_MA.py:770-802`` — Khatib 1987 OSC with nullspace posture
control), operating on batched per-arm mass matrices and end-effector
jacobians produced by the dynamics core (the ``acquire_jacobian_tensor`` /
``acquire_mass_matrix_tensor`` replacements, :891-911).  Also used by the
Factory-style low-level controllers (factory_control.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .engine import spd_inverse


def osc_torques(mm, j_eef, eef_vel, q, qd, dpose, default_dof_pos,
                kp=150.0, kd=None, kp_null=10.0, kd_null=None,
                effort_limit=None):
    """Batched OSC: (B,7,7) mass matrix, (B,6,7) jacobian -> (B,7) torques.

    ``dpose``: desired 6-dof pose delta [dpos(3), drot(3)];
    ``eef_vel``: [linvel(3), angvel(3)] of the end effector.
    """
    kd = 2.0 * jnp.sqrt(kp) if kd is None else kd
    kd_null = 2.0 * jnp.sqrt(kp_null) if kd_null is None else kd_null

    # both inverses are SPD (mass matrix; J M^-1 J^T) — the batch-lane
    # sweep kernel inverts them in one HBM round trip, where jnp.linalg.inv
    # lowers to LuDecompositionBlock custom-calls that cost 26 ms/step on
    # FrankaReachMA @ 8192 arms (traced)
    mm_inv = spd_inverse(mm)
    m_eef_inv = j_eef @ mm_inv @ jnp.swapaxes(j_eef, 1, 2)
    m_eef = spd_inverse(m_eef_inv)
    u = jnp.swapaxes(j_eef, 1, 2) @ m_eef @ (
        kp * dpose - kd * eef_vel)[..., None]

    # nullspace posture control toward the default configuration
    j_eef_inv = m_eef @ j_eef @ mm_inv
    u_null = kd_null * -qd + kp_null * (
        (default_dof_pos - q + np.pi) % (2 * np.pi) - np.pi)
    u_null = mm @ u_null[..., None]
    proj = jnp.eye(q.shape[-1], dtype=q.dtype) - jnp.swapaxes(j_eef, 1, 2) @ j_eef_inv
    u = (u + proj @ u_null)[..., 0]

    if effort_limit is not None:
        u = jnp.clip(u, -effort_limit, effort_limit)
    return u
