"""Low-level task-space controllers (reference tasks/factory/factory_control.py,
562 LoC — the 7 Factory controller modes) in JAX.

Implements the same control math against this engine's readouts
(``dynamics_readout``/``point_jacobian`` instead of
acquire_jacobian/mass-matrix tensors):

* ``get_pose_error`` (ref :179-213) — position + axis-angle (or quat) error,
* ``get_delta_dof_pos`` (ref :233-268) — IK via pinv / transpose / damped
  least squares / adaptive SVD,
* ``compute_dof_pos_target`` (ref :41-72) — joint-position targets toward a
  fingertip-midpoint pose target (gym-default and joint-space ID modes),
* ``compute_dof_torque`` (ref :74-177) — joint-space PD (opt. joint-space
  inertial comp) and task-space motion/force control (opt. operational-space
  Lambda inertial comp, open/closed-loop force, hybrid axes), gripper PD,
  +-100 Nm clamp,
* ``axis_angle_from_quat`` (ref :369-382) with the small-angle Taylor guard.

All functions are batched over envs and jit-safe; ``cfg_ctrl`` mirrors the
reference's dict (gain_space, ik_method, do_motion_ctrl, do_force_ctrl,
do_inertial_comp, motion/force_ctrl_axes, gains).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import maths


def axis_angle_from_quat(quat: jax.Array, eps: float = 1.0e-6) -> jax.Array:
    """Rotation vector from xyzw quaternion (ref :369-382)."""
    mag = jnp.linalg.norm(quat[..., 0:3], axis=-1)
    half_angle = jnp.arctan2(mag, quat[..., 3])
    angle = 2.0 * half_angle
    small = jnp.abs(angle) < eps
    # sin(x/2)/x ~= 1/2 - x^2/48 near zero (Taylor, as in the reference)
    sin_half_over_angle = jnp.where(
        small, 0.5 - angle * angle / 48.0,
        jnp.sin(half_angle) / jnp.where(small, 1.0, angle))
    # axis * angle = xyz / (sin(angle/2) / angle)
    return quat[..., 0:3] / jnp.maximum(sin_half_over_angle, 1e-12)[..., None]


def get_pose_error(pos, quat, target_pos, target_quat,
                   rot_error_type: str = "axis_angle"):
    """Fingertip-midpoint pose error (ref get_pose_error :179-213)."""
    pos_error = target_pos - pos
    quat_dot = jnp.sum(quat * target_quat, axis=-1, keepdims=True)
    quat_ = jnp.where(quat_dot >= 0, quat, -quat)  # shortest arc
    quat_error = maths.quat_mul(target_quat, maths.quat_conjugate(quat_))
    if rot_error_type == "quat":
        return pos_error, quat_error
    return pos_error, axis_angle_from_quat(quat_error)


def get_delta_dof_pos(delta_pose, ik_method: str, jacobian):
    """IK: delta dof from 6-dim task-space delta (ref :233-268).

    jacobian: (N, 6, D).
    """
    JT = jnp.swapaxes(jacobian, 1, 2)
    if ik_method == "pinv":
        J_pinv = jnp.linalg.pinv(jacobian)
        return jnp.einsum("ndk,nk->nd", J_pinv, delta_pose)
    if ik_method == "trans":
        return jnp.einsum("ndk,nk->nd", JT, delta_pose)
    if ik_method == "dls":
        lam = 0.1
        JJT = jacobian @ JT + (lam ** 2) * jnp.eye(jacobian.shape[1])
        return jnp.einsum("ndk,nk->nd", JT @ jnp.linalg.inv(JJT), delta_pose)
    if ik_method == "svd":
        U, S, Vh = jnp.linalg.svd(jacobian, full_matrices=False)
        S_inv = jnp.where(S > 1.0e-5, 1.0 / S, 0.0)
        J_pinv = jnp.swapaxes(Vh, 1, 2) @ (S_inv[:, :, None] *
                                           jnp.swapaxes(U, 1, 2))
        return jnp.einsum("ndk,nk->nd", J_pinv, delta_pose)
    raise ValueError(f"unknown ik_method {ik_method}")


def apply_task_space_gains(delta_pose, linvel, angvel, task_prop_gains,
                           task_deriv_gains):
    """(ref _apply_task_space_gains :271-290)."""
    lin = task_prop_gains[..., 0:3] * delta_pose[..., 0:3] \
        + task_deriv_gains[..., 0:3] * (0.0 - linvel)
    rot = task_prop_gains[..., 3:6] * delta_pose[..., 3:6] \
        + task_deriv_gains[..., 3:6] * (0.0 - angvel)
    return jnp.concatenate([lin, rot], -1)


def compute_dof_pos_target(cfg_ctrl, arm_dof_pos, fingertip_pos,
                           fingertip_quat, jacobian, target_pos, target_quat,
                           target_gripper_dof_pos):
    """Joint position targets toward the fingertip pose target (ref :41-72)."""
    pos_err, aa_err = get_pose_error(fingertip_pos, fingertip_quat,
                                     target_pos, target_quat)
    delta = jnp.concatenate([pos_err, aa_err], -1)
    d_arm = get_delta_dof_pos(delta, cfg_ctrl["ik_method"], jacobian)
    return jnp.concatenate([arm_dof_pos + d_arm, target_gripper_dof_pos], -1)


def compute_dof_torque(cfg_ctrl, dof_pos, dof_vel, fingertip_pos,
                       fingertip_quat, fingertip_linvel, fingertip_angvel,
                       jacobian, arm_mass_matrix, target_gripper_dof_pos,
                       target_pos, target_quat,
                       target_contact_wrench=None,
                       left_finger_force=None, right_finger_force=None):
    """Franka 9-dof torques toward the fingertip pose target (ref :74-177)."""
    n = dof_pos.shape[0]
    arm_tau = jnp.zeros((n, 7), dof_pos.dtype)
    JT = jnp.swapaxes(jacobian, 1, 2)

    if cfg_ctrl["gain_space"] == "joint":
        pos_err, aa_err = get_pose_error(fingertip_pos, fingertip_quat,
                                         target_pos, target_quat)
        delta = jnp.concatenate([pos_err, aa_err], -1)
        d_arm = get_delta_dof_pos(delta, cfg_ctrl["ik_method"], jacobian)
        arm_tau = cfg_ctrl["joint_prop_gains"] * d_arm \
            + cfg_ctrl["joint_deriv_gains"] * (0.0 - dof_vel[:, 0:7])
        if cfg_ctrl.get("do_inertial_comp"):
            arm_tau = jnp.einsum("nij,nj->ni", arm_mass_matrix, arm_tau)
    elif cfg_ctrl["gain_space"] == "task":
        task_wrench = jnp.zeros((n, 6), dof_pos.dtype)
        if cfg_ctrl.get("do_motion_ctrl", True):
            pos_err, aa_err = get_pose_error(fingertip_pos, fingertip_quat,
                                             target_pos, target_quat)
            delta = jnp.concatenate([pos_err, aa_err], -1)
            w_motion = apply_task_space_gains(
                delta, fingertip_linvel, fingertip_angvel,
                cfg_ctrl["task_prop_gains"], cfg_ctrl["task_deriv_gains"])
            if cfg_ctrl.get("do_inertial_comp"):
                # operational-space Lambda = (J M^-1 J^T)^-1 (ETH eq. 3.86)
                from ..physics.engine import spd_inverse
                M_inv = spd_inverse(arm_mass_matrix)
                lam = spd_inverse(jacobian @ M_inv @ JT
                                     + 1e-6 * jnp.eye(6))
                w_motion = jnp.einsum("nij,nj->ni", lam, w_motion)
            task_wrench = task_wrench + jnp.asarray(
                cfg_ctrl["motion_ctrl_axes"], dof_pos.dtype) * w_motion
        if cfg_ctrl.get("do_force_ctrl"):
            w_force = target_contact_wrench
            if cfg_ctrl.get("force_ctrl_method") == "closed":
                # closed-loop wrench error from finger force sensors
                force = left_finger_force + right_finger_force
                err = jnp.concatenate(
                    [target_contact_wrench[:, 0:3] - force,
                     target_contact_wrench[:, 3:6]], -1)
                w_force = w_force + cfg_ctrl["wrench_prop_gains"] * err
            task_wrench = task_wrench + jnp.asarray(
                cfg_ctrl["force_ctrl_axes"], dof_pos.dtype) * w_force
        arm_tau = jnp.einsum("ndk,nk->nd", JT, task_wrench)  # tau = J^T w
    else:
        raise ValueError(f"unknown gain_space {cfg_ctrl['gain_space']}")

    gripper_tau = cfg_ctrl["gripper_prop_gains"] * (
        target_gripper_dof_pos - dof_pos[:, 7:9]) \
        + cfg_ctrl["gripper_deriv_gains"] * (0.0 - dof_vel[:, 7:9])
    return jnp.clip(jnp.concatenate([arm_tau, gripper_tau], -1),
                    -100.0, 100.0)


def translate_along_local_z(pos, quat, offset):
    """Point offset along the frame's local z (ref :346-356)."""
    z = maths.quat_apply(quat, jnp.asarray([0.0, 0.0, 1.0], pos.dtype))
    return pos + offset * z


def parse_ctrl_cfg(ctrl_cfg: dict, ctrl_type: str, num_envs: int) -> dict:
    """Build cfg_ctrl from the task yaml ``ctrl`` section
    (factory_base.py parse_controller_spec equivalent)."""
    # Hydra-merge parity: the task yaml's ``all`` section supplies defaults
    # for every mode; mode-specific keys win (the factory tasks set their
    # gripper gains in ``all`` — pick 50/2, place 100/2, screw 100/1 —
    # an order of magnitude softer than gym_default's 500/20).
    c = dict(ctrl_cfg.get("all", {}))
    c.update(ctrl_cfg[ctrl_type])
    out = {"num_envs": num_envs, "ctrl_type": ctrl_type,
           "jacobian_type": c.get("jacobian_type", "geometric"),
           "ik_method": c.get("ik_method", "dls")}
    bcast = lambda v: jnp.asarray(v, jnp.float32)
    if ctrl_type == "gym_default":
        out.update(gain_space="joint", do_inertial_comp=False,
                   joint_prop_gains=bcast(c["joint_prop_gains"]),
                   joint_deriv_gains=bcast(c["joint_deriv_gains"]),
                   gripper_prop_gains=bcast(c["gripper_prop_gains"]),
                   gripper_deriv_gains=bcast(c["gripper_deriv_gains"]))
    elif ctrl_type == "joint_space_ik":
        out.update(gain_space="joint", do_inertial_comp=False,
                   joint_prop_gains=bcast(c["joint_prop_gains"]),
                   joint_deriv_gains=bcast(c["joint_deriv_gains"]),
                   gripper_prop_gains=bcast(c.get("gripper_prop_gains", [500, 500])),
                   gripper_deriv_gains=bcast(c.get("gripper_deriv_gains", [20, 20])))
    elif ctrl_type == "joint_space_id":
        out.update(gain_space="joint", do_inertial_comp=True,
                   joint_prop_gains=bcast(c["joint_prop_gains"]),
                   joint_deriv_gains=bcast(c["joint_deriv_gains"]),
                   gripper_prop_gains=bcast(c.get("gripper_prop_gains", [500, 500])),
                   gripper_deriv_gains=bcast(c.get("gripper_deriv_gains", [20, 20])))
    elif ctrl_type == "task_space_impedance":
        out.update(gain_space="task", do_motion_ctrl=True, do_force_ctrl=False,
                   do_inertial_comp=False,
                   motion_ctrl_axes=c.get("motion_ctrl_axes", [1] * 6),
                   task_prop_gains=bcast(c["task_prop_gains"]),
                   task_deriv_gains=bcast(c["task_deriv_gains"]),
                   gripper_prop_gains=bcast(c.get("gripper_prop_gains", [500, 500])),
                   gripper_deriv_gains=bcast(c.get("gripper_deriv_gains", [20, 20])))
    elif ctrl_type == "operational_space_motion":
        out.update(gain_space="task", do_motion_ctrl=True, do_force_ctrl=False,
                   do_inertial_comp=True,
                   motion_ctrl_axes=c.get("motion_ctrl_axes", [1] * 6),
                   task_prop_gains=bcast(c["task_prop_gains"]),
                   task_deriv_gains=bcast(c["task_deriv_gains"]),
                   gripper_prop_gains=bcast(c.get("gripper_prop_gains", [500, 500])),
                   gripper_deriv_gains=bcast(c.get("gripper_deriv_gains", [20, 20])))
    elif ctrl_type == "open_loop_force":
        out.update(gain_space="task", do_motion_ctrl=False, do_force_ctrl=True,
                   do_inertial_comp=False, force_ctrl_method="open",
                   force_ctrl_axes=c.get("force_ctrl_axes", [1] * 6),
                   gripper_prop_gains=bcast(c.get("gripper_prop_gains", [500, 500])),
                   gripper_deriv_gains=bcast(c.get("gripper_deriv_gains", [20, 20])))
    elif ctrl_type == "closed_loop_force":
        out.update(gain_space="task", do_motion_ctrl=False, do_force_ctrl=True,
                   do_inertial_comp=False, force_ctrl_method="closed",
                   force_ctrl_axes=c.get("force_ctrl_axes", [1] * 6),
                   wrench_prop_gains=bcast(c["wrench_prop_gains"]),
                   gripper_prop_gains=bcast(c.get("gripper_prop_gains", [500, 500])),
                   gripper_deriv_gains=bcast(c.get("gripper_deriv_gains", [20, 20])))
    elif ctrl_type == "hybrid_force_motion":
        out.update(gain_space="task", do_motion_ctrl=True, do_force_ctrl=True,
                   do_inertial_comp=True, force_ctrl_method="closed",
                   motion_ctrl_axes=c.get("motion_ctrl_axes", [1] * 6),
                   force_ctrl_axes=c.get("force_ctrl_axes", [0] * 6),
                   task_prop_gains=bcast(c["task_prop_gains"]),
                   task_deriv_gains=bcast(c["task_deriv_gains"]),
                   wrench_prop_gains=bcast(c["wrench_prop_gains"]),
                   gripper_prop_gains=bcast(c.get("gripper_prop_gains", [500, 500])),
                   gripper_deriv_gains=bcast(c.get("gripper_deriv_gains", [20, 20])))
    else:
        raise ValueError(f"unknown ctrl_type {ctrl_type}")
    return out
