"""BallBalance tests: pair contact (ball-on-tray), attractor pinning,
PD-drive stability, reward kernel."""
import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenvs_ma_tpu.tasks.ball_balance import (BallBalance, TASK_CFG,
                                                    TRAY_HEIGHT, BALL_RADIUS)
from isaacgymenvs_ma_tpu.utils.config import deep_merge


def make_task(n=8):
    return BallBalance(deep_merge(TASK_CFG, {"env": {"numEnvs": n}}))


def test_ball_lands_on_tray():
    task = make_task(8)
    state = task.initial_state(jax.random.PRNGKey(0))

    @jax.jit
    def run(state):
        def body(s, _):
            s, res = task.step(s, jnp.zeros((8, 3)))
            return s, res.obs
        return jax.lax.scan(body, state, None, length=300)

    s, obs = run(state)
    obs = np.asarray(obs)
    assert np.isfinite(obs).all()
    ball_z = obs[-1, :, 8]
    # some balls roll off (reset+retry), but with zero action the tray stays
    # near its build height and balls that land stay above it
    tray_z = np.asarray(s.sim.q)[:, 2]
    assert (np.abs(tray_z - TRAY_HEIGHT) < 0.25).all(), tray_z
    assert (ball_z > BALL_RADIUS).all()


def test_attractors_pin_feet():
    task = make_task(4)
    state = task.initial_state(jax.random.PRNGKey(0))

    @jax.jit
    def run(state):
        def body(s, _):
            s, res = task.step(s, jnp.zeros((4, 3)))
            return s, None
        return jax.lax.scan(body, state, None, length=120)[0]

    s = run(state)
    eng = task.engine
    bx, bq = eng.fk(s.sim.q)
    from isaacgymenvs_ma_tpu.ops import maths
    for a in eng.attractors:
        p = bx[:, a["body"]] + maths.quat_apply(bq[:, a["body"]], a["offset"])
        err = np.linalg.norm(np.asarray(p) - np.asarray(a["target"]), axis=-1)
        assert err.max() < 0.03, err


def test_reward_and_reset_kernel():
    task = make_task(4)
    state = task.initial_state(jax.random.PRNGKey(3))
    state, res = jax.jit(task.step)(state, jnp.zeros((4, 3)))
    rew = np.asarray(res.rew)
    assert (rew > 0).all() and (rew <= 1.0).all()
    assert res.obs.shape == (4, 24)
