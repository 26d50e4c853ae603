"""factory_control parity tests: pose error, IK methods, task-space torque."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaacgymenvs_ma_tpu.ops import controllers as ctl
from isaacgymenvs_ma_tpu.ops import maths


def test_axis_angle_from_quat():
    # 90 deg about z
    q = jnp.asarray([[0.0, 0.0, np.sin(np.pi / 4), np.cos(np.pi / 4)]])
    aa = np.asarray(ctl.axis_angle_from_quat(q))[0]
    assert np.allclose(aa, [0, 0, np.pi / 2], atol=1e-5)
    # tiny rotation: linear regime
    q2 = jnp.asarray([[1e-7, 0.0, 0.0, 1.0]])
    aa2 = np.asarray(ctl.axis_angle_from_quat(q2))[0]
    assert np.allclose(aa2, [2e-7, 0, 0], atol=1e-9)


def test_pose_error_zero_and_direction():
    pos = jnp.zeros((1, 3))
    quat = jnp.asarray([[0.0, 0, 0, 1.0]])
    pe, ae = ctl.get_pose_error(pos, quat, pos + 0.1, quat)
    assert np.allclose(np.asarray(pe), 0.1)
    assert np.allclose(np.asarray(ae), 0.0, atol=1e-6)
    # sign flip (double cover) must not produce a large error
    pe, ae = ctl.get_pose_error(pos, -quat, pos, quat)
    assert np.allclose(np.asarray(ae), 0.0, atol=1e-5)


@pytest.mark.parametrize("ik", ["pinv", "trans", "dls", "svd"])
def test_ik_methods_reduce_error(ik):
    """Planar 2-link arm: iterating IK must shrink task-space error."""
    L1, L2 = 0.5, 0.4

    def fk(q):
        x = L1 * jnp.cos(q[:, 0]) + L2 * jnp.cos(q[:, 0] + q[:, 1])
        y = L1 * jnp.sin(q[:, 0]) + L2 * jnp.sin(q[:, 0] + q[:, 1])
        return jnp.stack([x, y], -1)

    def jac(q):
        s1, c1 = jnp.sin(q[:, 0]), jnp.cos(q[:, 0])
        s12 = jnp.sin(q[:, 0] + q[:, 1])
        c12 = jnp.cos(q[:, 0] + q[:, 1])
        row_x = jnp.stack([-L1 * s1 - L2 * s12, -L2 * s12], -1)
        row_y = jnp.stack([L1 * c1 + L2 * c12, L2 * c12], -1)
        zeros = jnp.zeros_like(row_x)
        return jnp.stack([row_x, row_y, zeros, zeros, zeros, zeros], 1)

    q = jnp.asarray([[0.3, 0.4]])
    target = jnp.asarray([[0.6, 0.3]])
    err0 = float(jnp.linalg.norm(fk(q) - target))
    # J^T descent converges much more slowly than the pseudo-inverse family
    iters, thresh = (400, 0.3) if ik == "trans" else (40, 0.1)
    for _ in range(iters):
        delta = jnp.concatenate([target - fk(q), jnp.zeros((1, 4))], -1)
        dq = ctl.get_delta_dof_pos(delta, ik, jac(q))
        q = q + 0.3 * dq
    err = float(jnp.linalg.norm(fk(q) - target))
    assert err < err0 * thresh, f"{ik}: {err0} -> {err}"


def test_task_space_torque_direction():
    n = 2
    cfg = {"gain_space": "task", "do_motion_ctrl": True, "do_force_ctrl": False,
           "do_inertial_comp": False, "ik_method": "dls",
           "motion_ctrl_axes": [1, 1, 1, 1, 1, 1],
           "task_prop_gains": jnp.full(6, 100.0),
           "task_deriv_gains": jnp.full(6, 10.0),
           "gripper_prop_gains": jnp.full(2, 500.0),
           "gripper_deriv_gains": jnp.full(2, 20.0)}
    dof_pos = jnp.zeros((n, 9))
    dof_vel = jnp.zeros((n, 9))
    ft_pos = jnp.zeros((n, 3))
    ft_quat = jnp.tile(jnp.asarray([0.0, 0, 0, 1.0]), (n, 1))
    # J maps dof0 -> +x translation only
    J = jnp.zeros((n, 6, 7)).at[:, 0, 0].set(1.0)
    M = jnp.tile(jnp.eye(7), (n, 1, 1))
    tau = ctl.compute_dof_torque(
        cfg, dof_pos, dof_vel, ft_pos, ft_quat, jnp.zeros((n, 3)),
        jnp.zeros((n, 3)), J, M, jnp.full((n, 2), 0.04),
        ft_pos + jnp.asarray([0.1, 0, 0]), ft_quat)
    t = np.asarray(tau)
    assert t[0, 0] > 1.0            # pulls dof0 toward +x
    assert np.allclose(t[0, 1:7], 0.0, atol=1e-5)
    assert (t[0, 7:9] > 0).all()     # gripper opens toward 0.04
    assert (np.abs(t) <= 100.0).all()


def test_operational_space_inertial_comp():
    """Lambda scaling: heavier joint-space inertia -> larger wrench."""
    n = 1
    base = {"gain_space": "task", "do_motion_ctrl": True,
            "do_force_ctrl": False, "ik_method": "dls",
            "motion_ctrl_axes": [1] * 6,
            "task_prop_gains": jnp.full(6, 10.0),
            "task_deriv_gains": jnp.zeros(6),
            "gripper_prop_gains": jnp.zeros(2),
            "gripper_deriv_gains": jnp.zeros(2)}
    J = jnp.zeros((n, 6, 7)).at[:, 0, 0].set(1.0)
    M_heavy = jnp.tile(4.0 * jnp.eye(7), (n, 1, 1))
    args = (jnp.zeros((n, 9)), jnp.zeros((n, 9)), jnp.zeros((n, 3)),
            jnp.tile(jnp.asarray([0.0, 0, 0, 1.0]), (n, 1)),
            jnp.zeros((n, 3)), jnp.zeros((n, 3)), J, M_heavy,
            jnp.zeros((n, 2)),
            jnp.asarray([[0.1, 0.0, 0.0]]),
            jnp.tile(jnp.asarray([0.0, 0, 0, 1.0]), (n, 1)))
    tau_plain = ctl.compute_dof_torque({**base, "do_inertial_comp": False}, *args)
    tau_osc = ctl.compute_dof_torque({**base, "do_inertial_comp": True}, *args)
    # Lambda = (J M^-1 J^T)^-1 = 4 on the driven axis
    assert float(tau_osc[0, 0]) == pytest.approx(4 * float(tau_plain[0, 0]),
                                                 rel=1e-3)


def test_parse_ctrl_cfg_modes():
    yaml_ctrl = {
        "all": {"jacobian_type": "geometric", "gripper_prop_gains": [500, 500],
                "gripper_deriv_gains": [20, 20]},
        "gym_default": {"ik_method": "dls",
                        "joint_prop_gains": [40] * 7,
                        "joint_deriv_gains": [8] * 7,
                        "gripper_prop_gains": [500, 500],
                        "gripper_deriv_gains": [20, 20]},
        "joint_space_id": {"ik_method": "dls", "joint_prop_gains": [40] * 7,
                           "joint_deriv_gains": [8] * 7},
        "task_space_impedance": {"motion_ctrl_axes": [1] * 6,
                                 "task_prop_gains": [40] * 6,
                                 "task_deriv_gains": [8] * 6},
        "operational_space_motion": {"motion_ctrl_axes": [1] * 6,
                                     "task_prop_gains": [1] * 6,
                                     "task_deriv_gains": [1] * 6},
        "open_loop_force": {"force_ctrl_axes": [0, 0, 1, 0, 0, 0]},
        "closed_loop_force": {"force_ctrl_axes": [0, 0, 1, 0, 0, 0],
                              "wrench_prop_gains": [0.1] * 6},
        "hybrid_force_motion": {"motion_ctrl_axes": [1, 1, 0, 1, 1, 1],
                                "force_ctrl_axes": [0, 0, 1, 0, 0, 0],
                                "task_prop_gains": [40] * 6,
                                "task_deriv_gains": [8] * 6,
                                "wrench_prop_gains": [0.1] * 6},
    }
    for mode in ("gym_default", "joint_space_id", "task_space_impedance",
                 "operational_space_motion", "open_loop_force",
                 "closed_loop_force", "hybrid_force_motion"):
        cfg = ctl.parse_ctrl_cfg(yaml_ctrl, mode, 4)
        assert cfg["ctrl_type"] == mode
        assert cfg["gain_space"] in ("joint", "task")
