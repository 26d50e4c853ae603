"""IndustReal: analytic SDFs, SAPU weighting, SBC curriculum, stepping."""
import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaacgymenvs_ma_tpu.tasks.industreal import (
    IndustRealTaskPegsInsert, IndustRealTaskGearsInsert, TASK_CFGS,
    sdf_box, sdf_cylinder, sdf_socket_material,
    PLUG_LENGTH, SOCKET_HALF, SOCKET_HOLE_R, TABLE_HEIGHT)


def test_sdf_primitives():
    # cylinder: inside negative, outside positive, surface zero
    p = jnp.asarray([[0.0, 0, 0], [0.02, 0, 0], [0.01, 0, 0]])
    d = np.asarray(sdf_cylinder(p, 0.01, 0.05))
    assert d[0] < 0 and d[1] == pytest.approx(0.01, abs=1e-6)
    assert abs(d[2]) < 1e-6
    # box
    d = np.asarray(sdf_box(jnp.asarray([[0.0, 0, 0], [2.0, 0, 0]]),
                           [1.0, 1.0, 1.0]))
    assert d[0] == pytest.approx(-1.0) and d[1] == pytest.approx(1.0)


def test_socket_material_sdf_has_hole():
    # point inside the hole (above base): NOT in material
    in_hole = jnp.asarray([[0.0, 0.0, SOCKET_HALF[2]]])
    assert float(sdf_socket_material(in_hole)[0]) > 0
    # point inside the block rim: in material (negative)
    in_rim = jnp.asarray([[SOCKET_HOLE_R + 0.004, 0.0, SOCKET_HALF[2]]])
    assert float(sdf_socket_material(in_rim)[0]) < 0


@pytest.fixture(scope="module")
def pegs():
    cfg = copy.deepcopy(TASK_CFGS["IndustRealTaskPegsInsert"])
    cfg["env"]["numEnvs"] = 2
    return IndustRealTaskPegsInsert(cfg)


@pytest.mark.slow
def test_pegs_step_finite(pegs):
    st = pegs.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(pegs.step)
    for _ in range(3):
        st, res = step(st, pegs.zero_actions())
    assert res.obs.shape == (2, 24)
    assert np.isfinite(np.asarray(res.obs)).all()
    assert np.isfinite(np.asarray(res.rew)).all()
    assert np.isfinite(np.asarray(st.sim.q)).all()


def test_sdf_reward_increases_toward_goal(pegs):
    n = 2
    ident = jnp.tile(jnp.asarray([0.0, 0, 0, 1.0]), (n, 1))
    goal = jnp.broadcast_to(pegs._goal_pos(), (n, 3))
    far = goal + jnp.asarray([0.0, 0.0, 0.1])
    r_goal = float(pegs._sdf_reward(goal, ident)[0])
    r_far = float(pegs._sdf_reward(far, ident)[0])
    assert r_goal > r_far


def test_sapu_interpen_detects_rim_hit(pegs):
    n = 2
    ident = jnp.tile(jnp.asarray([0.0, 0, 0, 1.0]), (n, 1))
    # plug centered in the hole: no interpenetration
    in_hole = jnp.broadcast_to(pegs._goal_pos(), (n, 3))
    assert float(pegs._sapu_interpen(in_hole, ident)[0]) < 1e-5
    # plug shifted sideways into the rim material: interpenetration
    in_rim = in_hole + jnp.asarray([0.008, 0.0, 0.0])
    assert float(pegs._sapu_interpen(in_rim, ident)[0]) > 1e-4


def test_sbc_curriculum_updates(pegs):
    st = pegs.initial_state(jax.random.PRNGKey(0))
    task = st.task
    d0 = float(task.curr_max_disp)
    # drive an episode-end step with forced insertion success
    st = st._replace(progress=jnp.full(2, pegs.max_episode_length - 1,
                                       jnp.int32))
    # place plugs exactly at the goal -> inserted
    m = pegs.model
    qa = int(m.q_adr[pegs.plug_body])
    goal = np.asarray(pegs._goal_pos())
    q = st.sim.q.at[:, qa: qa + 3].set(jnp.asarray(goal))
    from isaacgymenvs_ma_tpu.physics.engine import SimState
    st = st._replace(sim=SimState(q, st.sim.qd),
                     reset_buf=jnp.zeros_like(st.reset_buf))
    # bypass physics (the grab constraint would pull the plug back to the
    # gripper) and exercise the reward/curriculum path directly
    out = pegs.engine.forward(st.sim)
    obs, _, rew, reset, task2, extras = pegs.post_physics(
        st, out, pegs.zero_actions())
    assert float(extras["insertion_successes"]) > 0.9
    # success rate 1.0 > 0.75 -> harder (curr_max_disp decreases)
    assert float(task2.curr_max_disp) < d0
    # checkpoint roundtrip
    st2 = st._replace(task=task2)
    env_state = pegs.get_env_state(st2)
    st3 = pegs.set_env_state(st, env_state)
    assert float(st3.task.curr_max_disp) == float(task2.curr_max_disp)


@pytest.mark.slow
def test_gears_insert_builds():
    cfg = copy.deepcopy(TASK_CFGS["IndustRealTaskGearsInsert"])
    cfg["env"]["numEnvs"] = 2
    t = IndustRealTaskGearsInsert(cfg)
    st = t.initial_state(jax.random.PRNGKey(0))
    st, res = jax.jit(t.step)(st, t.zero_actions())
    assert np.isfinite(np.asarray(res.obs)).all()
