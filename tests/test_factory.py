"""Factory nut-bolt family: controllers drive the franka, screw joint threads."""
import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaacgymenvs_ma_tpu.tasks.factory import (
    FactoryTaskNutBoltPick, FactoryTaskNutBoltPlace, FactoryTaskNutBoltScrew,
    TASK_CFGS, TABLE_HEIGHT, NUT_HEIGHT, THREAD_PITCH, BOLT_HEAD_HEIGHT,
    BOLT_SHANK_LENGTH)


def _make(cls, name, n=2, **env):
    cfg = copy.deepcopy(TASK_CFGS[name])
    cfg["env"]["numEnvs"] = n
    cfg["env"].update(env)
    return cls(cfg)


@pytest.fixture(scope="module")
def pick():
    return _make(FactoryTaskNutBoltPick, "FactoryTaskNutBoltPick")


@pytest.mark.slow
def test_pick_step_finite(pick):
    st = pick.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(pick.step)
    for _ in range(3):
        st, res = step(st, pick.zero_actions())
    assert res.obs.shape == (2, 20)
    assert np.isfinite(np.asarray(res.obs)).all()
    assert np.isfinite(np.asarray(res.rew)).all()
    assert (np.asarray(res.rew) <= 0).all()   # -keypoint_dist
    # nut is resting on the table
    nut_z = np.asarray(st.sim.q)[:, pick.model.q_adr[pick.nut_body] + 2]
    assert (np.abs(nut_z - (TABLE_HEIGHT + NUT_HEIGHT / 2)) < 0.05).all()


@pytest.mark.slow
def test_pick_controller_moves_gripper(pick):
    """+z action must raise the fingertip midpoint (joint_space_id ctrl)."""
    st = pick.initial_state(jax.random.PRNGKey(1))
    step = jax.jit(pick.step)
    st, _ = step(st, pick.zero_actions())
    out = pick.engine.forward(st.sim)
    z0 = float(out.body_pos[:, pick.grip_site][0, 2])
    act = jnp.zeros((2, 12)).at[:, 2].set(1.0)
    for _ in range(8):
        st, _ = step(st, act)
    out = pick.engine.forward(st.sim)
    z1 = float(out.body_pos[:, pick.grip_site][0, 2])
    assert z1 > z0 + 0.01, f"{z0} -> {z1}"


@pytest.mark.slow
def test_place_obs_and_reset():
    t = _make(FactoryTaskNutBoltPlace, "FactoryTaskNutBoltPlace")
    st = t.initial_state(jax.random.PRNGKey(0))
    st, res = jax.jit(t.step)(st, t.zero_actions())
    assert res.obs.shape == (2, 27)
    assert np.isfinite(np.asarray(res.obs)).all()
    # nut starts at the gripper, not on the table
    out = t.engine.forward(st.sim)
    nut_pos = np.asarray(out.root_states[:, 2, 0:3])
    ft = np.asarray(out.body_pos[:, t.grip_site])
    assert (np.linalg.norm(nut_pos - ft, axis=-1) < 0.1).all()


@pytest.mark.slow
def test_screw_task_threads_nut():
    t = _make(FactoryTaskNutBoltScrew, "FactoryTaskNutBoltScrew")
    st = t.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(t.step)
    st, res = step(st, t.zero_actions())
    assert res.obs.shape == (2, 32)
    assert np.isfinite(np.asarray(res.obs)).all()
    # directly rotating the screw dof must descend the nut by the pitch
    m = t.model
    qa = int(m.q_adr[t.nut_body])
    out0 = t.engine.forward(st.sim)
    z0 = float(out0.body_pos[0, t.nut_body, 2])
    q = st.sim.q.at[:, qa].add(2 * np.pi)   # one full turn
    from isaacgymenvs_ma_tpu.physics.engine import SimState
    out1 = t.engine.forward(SimState(q, st.sim.qd))
    z1 = float(out1.body_pos[0, t.nut_body, 2])
    assert z1 == pytest.approx(z0 - THREAD_PITCH, abs=1e-6)
    # success at the bottom of the travel (nut resting on the bolt head);
    # clear reset_buf so the probe step doesn't re-reset the env first
    travel = BOLT_SHANK_LENGTH - NUT_HEIGHT * 0.5
    q_done = st.sim.q.at[:, qa].set(2 * np.pi * travel / THREAD_PITCH)
    st2 = st._replace(sim=SimState(q_done, st.sim.qd),
                      reset_buf=jnp.zeros_like(st.reset_buf))
    _, res2 = step(st2, t.zero_actions())
    assert float(res2.extras["successes"]) > 0.9


def test_ctrl_modes_build():
    """All controller modes parse against the factory ctrl schema."""
    from isaacgymenvs_ma_tpu.ops.controllers import parse_ctrl_cfg
    from isaacgymenvs_ma_tpu.tasks.factory import _CTRL_YAML
    for mode in ("gym_default", "joint_space_ik", "joint_space_id",
                 "task_space_impedance", "operational_space_motion",
                 "open_loop_force", "closed_loop_force",
                 "hybrid_force_motion"):
        cfg = parse_ctrl_cfg(_CTRL_YAML, mode, 2)
        assert cfg["ctrl_type"] == mode


@pytest.mark.slow
def test_evaluate_lift_runs(pick):
    st = pick.initial_state(jax.random.PRNGKey(0))
    st, _ = jax.jit(pick.step)(st, pick.zero_actions())
    success = jax.jit(pick.evaluate_lift)(st)
    assert success.shape == (2,)
    assert np.isfinite(np.asarray(success)).all()


@pytest.mark.slow
def test_gears_and_insertion_scenes():
    from isaacgymenvs_ma_tpu.tasks.factory import (FactoryTaskGears,
                                                   FactoryTaskInsertion)
    for cls, name in ((FactoryTaskGears, "FactoryTaskGears"),
                      (FactoryTaskInsertion, "FactoryTaskInsertion")):
        t = _make(cls, name)
        st = t.initial_state(jax.random.PRNGKey(0))
        st, res = jax.jit(t.step)(st, t.zero_actions())
        assert res.obs.shape == (2, 32)
        assert np.isfinite(np.asarray(res.obs)).all()
        assert np.allclose(np.asarray(res.rew), 0.0)
