"""Trifinger — keypoint reward kernels, goal sampling by difficulty, stepping."""
import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaacgymenvs_ma_tpu.tasks.trifinger import (Trifinger, TASK_CFG,
                                                 gen_keypoints, lgsk_kernel,
                                                 CUBE_SIZE, MAX_COM_DIST)


def _make(n=4, **env):
    cfg = copy.deepcopy(TASK_CFG)
    cfg["env"]["numEnvs"] = n
    cfg["env"].update(env)
    return Trifinger(cfg)


def test_lgsk_kernel_bounds():
    x = jnp.linspace(0.0, 1.0, 50)
    y = np.asarray(lgsk_kernel(x, scale=30.0, eps=2.0))
    assert (y > 0).all() and (y <= 1.0 / 4.0 + 1e-6).all()
    assert y[0] == pytest.approx(0.25, abs=1e-6)   # zero distance -> max
    assert y[-1] < 1e-8                             # far -> ~0


def test_gen_keypoints_identity():
    pose = jnp.asarray([[0.1, 0.2, 0.3, 0, 0, 0, 1.0]])
    kp = np.asarray(gen_keypoints(pose))[0]
    assert kp.shape == (8, 3)
    # corners at +-size/2 around the position
    assert np.allclose(sorted(kp[:, 0]), [0.1 - CUBE_SIZE / 2] * 4
                       + [0.1 + CUBE_SIZE / 2] * 4, atol=1e-6)
    # rotation moves keypoints consistently
    import isaacgymenvs_ma_tpu.ops.maths as maths
    q = maths.quat_from_angle_axis(jnp.asarray([np.pi / 2]),
                                   jnp.asarray([0.0, 0, 1.0]))
    pose_r = jnp.concatenate([pose[:, 0:3], q], -1)
    kp_r = np.asarray(gen_keypoints(pose_r))[0]
    assert not np.allclose(kp, kp_r)
    assert np.allclose(np.sort(np.linalg.norm(kp, axis=-1)),
                       np.sort(np.linalg.norm(kp_r, axis=-1)), atol=1e-5)


@pytest.fixture(scope="module")
def task():
    return _make()


def test_goal_sampling_difficulties(task):
    key = jax.random.PRNGKey(0)
    for d in (1, 2, 3, 4):
        task.difficulty = d
        g = np.asarray(task._sample_goal(key, 128))
        assert np.isfinite(g).all()
        r = np.linalg.norm(g[:, 0:2], axis=-1)
        assert (r <= MAX_COM_DIST + 1e-6).all()
        assert np.allclose(np.linalg.norm(g[:, 3:7], axis=-1), 1.0, atol=1e-5)
        if d == 2:
            assert np.allclose(g[:, 0:2], 0.0)
        if d in (1, 2, 3):  # no orientation goal
            assert np.allclose(np.abs(g[:, 6]), 1.0, atol=1e-5)
    task.difficulty = 4


@pytest.mark.slow
def test_step_and_obs_shapes(task):
    st = task.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(task.step)
    act = task.zero_actions()
    for _ in range(3):
        st, res = step(st, act)
    assert res.obs.shape == (task.num_envs, 41)
    assert res.states.shape == (task.num_envs, 113)
    assert np.isfinite(np.asarray(res.obs)).all()
    assert np.isfinite(np.asarray(res.states)).all()
    assert np.isfinite(np.asarray(res.rew)).all()
    # normalized obs should be mostly within [-1, 1] (clipped at 5)
    assert np.abs(np.asarray(res.obs)).mean() < 1.5


@pytest.mark.slow
def test_fingers_reach_reward_sign(task):
    """Moving fingertips toward the object must make reach term positive
    (weight is negative; distance decreasing -> curr-prev < 0)."""
    st = task.initial_state(jax.random.PRNGKey(1))
    step = jax.jit(task.step)
    st, _ = step(st, task.zero_actions())
    # closing torque on all lower joints curls fingers inward
    act = jnp.tile(jnp.asarray([0.0, 0.5, -0.5] * 3), (task.num_envs, 1))
    rews = []
    for _ in range(5):
        st, res = step(st, act)
        rews.append(float(res.rew.mean()))
    assert np.isfinite(rews).all()
