"""Humanoid task tests: spec integrity, stability, obs layout."""
import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenvs_ma_tpu.tasks.humanoid import Humanoid, TASK_CFG
from isaacgymenvs_ma_tpu.utils.config import deep_merge


def make_task(n=4):
    return Humanoid(deep_merge(TASK_CFG, {"env": {"numEnvs": n}}))


def test_humanoid_model():
    task = make_task(2)
    assert task.engine.nv == 27 and task.num_dof == 21
    assert len(task.engine.sensor_body) == 2
    assert float(task.max_motor_effort) == 135.0
    # gears in dof order include the knees (135) and ankles (90/22.5 family)
    assert np.isclose(np.asarray(task.motor_efforts).sum(), 1282.5)


def test_humanoid_runs_stable():
    task = make_task(4)
    state = task.initial_state(jax.random.PRNGKey(0))

    @jax.jit
    def run(state, key):
        def body(carry, _):
            s, k = carry
            k, ka = jax.random.split(k)
            a = jax.random.uniform(ka, (4, 21), minval=-1.0, maxval=1.0)
            s, res = task.step(s, a)
            return (s, k), (res.rew, res.obs)
        return jax.lax.scan(body, (state, key), None, length=150)

    (s, _), (rew, obs) = run(state, jax.random.PRNGKey(1))
    obs, rew = np.asarray(obs), np.asarray(rew)
    assert np.isfinite(obs).all() and np.isfinite(rew).all()
    assert obs.shape[-1] == 108
    assert np.abs(np.asarray(s.sim.qd)).max() < 300.0


def test_humanoid_standing_reward():
    """Right after reset the humanoid is upright: up_proj ~ 1, alive+heading
    rewards positive."""
    task = make_task(4)
    state = task.initial_state(jax.random.PRNGKey(0))
    state, res = jax.jit(task.step)(state, jnp.zeros((4, 21)))
    obs = np.asarray(res.obs)
    assert obs[:, 10].min() > 0.95  # up_proj
    assert np.asarray(res.rew).min() > 0.0
