"""FrankaCubeStack2: FSM stages and staged rewards."""
import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaacgymenvs_ma_tpu.tasks.franka_cube_stack2 import (FrankaCubeStack2,
                                                          TASK_CFG, CUBE_A,
                                                          CUBE_B)


@pytest.fixture(scope="module")
def task():
    cfg = copy.deepcopy(TASK_CFG)
    cfg["env"]["numEnvs"] = 2
    return FrankaCubeStack2(cfg)


def test_fsm_stages(task):
    n = 2
    far = jnp.full((n,), 1.0)
    near = jnp.full((n,), CUBE_A / 2 * 0.5)
    low = jnp.zeros((n,))
    lifted_h = jnp.full((n,), CUBE_B + CUBE_A)
    away_ab = jnp.tile(jnp.asarray([1.0, 1.0, 0.0]), (n, 1))
    aligned_ab = jnp.tile(jnp.asarray([0.0, 0.0, 0.3]), (n, 1))
    close_ab = jnp.tile(jnp.asarray([0.0, 0.0, 0.01]), (n, 1))
    closed = jnp.zeros((n, 7)).at[:, 6].set(-1.0)
    opened = jnp.zeros((n, 7)).at[:, 6].set(1.0)

    f = lambda *a: np.asarray(task._fsm(*a))
    assert (f(far, low, away_ab, opened) == 0).all()
    assert (f(near, low, away_ab, opened) == 1).all()
    assert (f(near, low, away_ab, closed) == 2).all()
    assert (f(near, lifted_h, away_ab, closed) == 3).all()
    assert (f(near, lifted_h, aligned_ab, closed) == 4).all()
    assert (f(near, lifted_h, close_ab, closed) == 5).all()
    assert (f(near, lifted_h, close_ab, opened) == 6).all()


@pytest.mark.slow
def test_step_runs(task):
    st = task.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(task.step)
    for _ in range(2):
        st, res = step(st, task.zero_actions())
    assert res.obs.shape == (2, 21)
    assert np.isfinite(np.asarray(res.obs)).all()
    assert (np.asarray(res.rew) >= 0).all()
    assert "fsm_mean" in res.extras
