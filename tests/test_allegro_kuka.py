"""AllegroKuka family — subtask resolver, reward machinery, curriculum."""
import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaacgymenvs_ma_tpu.tasks.allegro_kuka import (
    TASK_CFG, AllegroKukaReorientation, AllegroKukaRegrasping,
    AllegroKukaThrow, resolve_allegro_kuka, resolve_allegro_kuka_two_arms)


def _make(subtask="reorientation", n=2, two_arms=False, **env):
    cfg = copy.deepcopy(TASK_CFG)
    cfg["env"]["numEnvs"] = n
    cfg["env"]["subtask"] = subtask
    cfg["env"].update(env)
    if two_arms:
        return resolve_allegro_kuka_two_arms(cfg)
    return resolve_allegro_kuka(cfg)


def test_resolver_and_dims():
    t = _make("reorientation")
    assert isinstance(t, AllegroKukaReorientation)
    assert t.num_actions == 23
    assert t.num_keypoints == 4
    # full_state: 2*23 + 13 + 10 + 12 + 4*3 + 4*3 + 3+1+1+2+4+1 = 117
    assert t.num_obs == 117
    t2 = _make("regrasping")
    assert isinstance(t2, AllegroKukaRegrasping)
    assert t2.num_obs == 99   # single keypoint
    t3 = _make("throw")
    assert isinstance(t3, AllegroKukaThrow)


@pytest.fixture(scope="module")
def reo():
    return _make("reorientation")


@pytest.mark.slow
def test_step_finite(reo):
    st = reo.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(reo.step)
    for _ in range(4):
        st, res = step(st, reo.zero_actions())
    assert res.obs.shape == (2, 117)
    assert np.isfinite(np.asarray(res.obs)).all()
    assert np.isfinite(np.asarray(res.rew)).all()
    assert np.isfinite(np.asarray(st.sim.q)).all()
    # frames advanced, goal inside target volume
    assert float(st.task.frames) == 4.0
    g = np.asarray(st.task.goal_pose)
    assert (g[:, 2] > 0.6).all() and (g[:, 2] < 1.1).all()


def test_curriculum_and_true_objective(reo):
    task = reo.initial_task_state()
    # no update before interval
    assert float(task.success_tolerance) == pytest.approx(0.075)
    task2 = task._replace(
        frames=jnp.asarray(4000.0),
        prev_episode_successes=jnp.full(2, 5.0))
    # emulate one post-physics curriculum step
    due = (task2.frames - task2.last_curriculum_update) >= reo.tol_interval
    assert bool(due)
    # true objective: successes scaled down while tolerance above target
    to = reo._true_objective(task, jnp.asarray([10.0, 0.0]))
    assert np.asarray(to)[0] == pytest.approx(0.1, abs=1e-5)
    done_task = task._replace(
        success_tolerance=jnp.asarray(reo.target_tolerance))
    to2 = reo._true_objective(done_task, jnp.asarray([10.0, 0.0]))
    assert np.asarray(to2)[0] == pytest.approx(11.0, abs=1e-5)


@pytest.mark.slow
def test_goal_reset_on_success(reo):
    st = reo.initial_state(jax.random.PRNGKey(0))
    st, _ = jax.jit(reo.step)(st, reo.zero_actions())
    old_goal = np.asarray(st.task.goal_pose)
    # force success flag -> next step must resample goals and zero counters
    task = st.task._replace(goal_reset=jnp.ones(2, jnp.int32),
                            near_goal_steps=jnp.full(2, 3, jnp.int32))
    st = st._replace(task=task)
    st, _ = jax.jit(reo.step)(st, reo.zero_actions())
    assert not np.allclose(np.asarray(st.task.goal_pose), old_goal)
    assert (np.asarray(st.task.goal_reset) == 0).all()


@pytest.mark.slow
def test_two_arms_builds():
    t = _make("regrasping", two_arms=True)
    assert t.num_actions == 46
    st = t.initial_state(jax.random.PRNGKey(0))
    st, res = jax.jit(t.step)(st, t.zero_actions())
    assert np.isfinite(np.asarray(res.obs)).all()
