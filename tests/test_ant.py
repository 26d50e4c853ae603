"""Ant task tests: model parity with the MJCF parser, physical stability,
obs/reward kernel sanity, and short-horizon learnability."""
import jax
import jax.numpy as jnp
import numpy as np
import os
import pytest

from isaacgymenvs_ma_tpu.models.robots import build_ant
from isaacgymenvs_ma_tpu.tasks.ant import Ant, TASK_CFG
from isaacgymenvs_ma_tpu.utils.config import deep_merge

REF_MJCF = "/root/reference/assets/mjcf/nv_ant.xml"


def make_task(n=8):
    return Ant(deep_merge(TASK_CFG, {"env": {"numEnvs": n}}))


def test_ant_model_structure():
    m = build_ant()
    assert m.nb == 9 and m.nv == 14 and m.nq == 15
    assert len(m.sensor_body) == 4
    assert list(m.actuator_gear) == [15.0] * 8
    # 8 actuated hinges with +-40deg hips
    assert np.allclose(m.dof_lower[6], -np.deg2rad(40))
    assert m.mass[0] > 0.4  # torso sphere + 4 aux capsules at density 5


@pytest.mark.skipif(not os.path.exists(REF_MJCF), reason="reference assets absent")
def test_ant_matches_mjcf_parse():
    """Procedural ant == parsed nv_ant.xml (masses, inertia, limits, tree)."""
    from isaacgymenvs_ma_tpu.models.mjcf import load_mjcf
    mp = load_mjcf(REF_MJCF)
    mb = build_ant()
    assert mp.nb == mb.nb and mp.nv == mb.nv
    assert np.allclose(mp.mass, mb.mass, rtol=1e-5)
    assert np.allclose(mp.com, mb.com, atol=1e-6)
    assert np.allclose(mp.inertia, mb.inertia, rtol=1e-4, atol=1e-9)
    assert np.allclose(mp.dof_lower[6:], mb.dof_lower[6:], atol=1e-6)
    assert np.allclose(mp.dof_upper[6:], mb.dof_upper[6:], atol=1e-6)
    assert np.allclose(mp.dof_armature, mb.dof_armature)
    assert np.allclose(mp.dof_damping, mb.dof_damping)
    assert list(mp.parent) == list(mb.parent)
    assert np.allclose(mp.init_qpos, mb.init_qpos)


def test_ant_stability_random_actions():
    task = make_task(8)
    state = task.initial_state(jax.random.PRNGKey(0))

    @jax.jit
    def run(state, key):
        def body(carry, _):
            s, k = carry
            k, ka = jax.random.split(k)
            a = jax.random.uniform(ka, (8, 8), minval=-1.0, maxval=1.0)
            s, res = task.step(s, a)
            return (s, k), (res.rew, res.obs)
        return jax.lax.scan(body, (state, key), None, length=300)

    (s, _), (rew, obs) = run(state, jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(obs)).all()
    assert np.isfinite(np.asarray(rew)).all()
    assert np.abs(np.asarray(s.sim.qd)).max() < 200.0


def test_ant_settles_and_rewards():
    task = make_task(4)
    state = task.initial_state(jax.random.PRNGKey(0))

    @jax.jit
    def run(state):
        def body(s, _):
            s, res = task.step(s, jnp.zeros((4, 8)))
            return s, (res.rew, res.obs, res.extras["true_objective"])
        return jax.lax.scan(body, state, None, length=200)

    s, (rew, obs, true_obj) = run(state)
    obs = np.asarray(obs)
    # torso stays above termination height under zero action
    assert (obs[-1, :, 0] > 0.31).all()
    # alive + up + heading rewards present: reward near 0.5-1.3 when standing
    assert np.asarray(rew)[-1].min() > 0.0
    # obs layout: up_proj ~ 1 when upright
    assert obs[-1, :, 10].min() > 0.9
    assert np.isfinite(np.asarray(true_obj)).all()


def test_ant_obs_layout_dims():
    task = make_task(2)
    state = task.initial_state(jax.random.PRNGKey(0))
    state, res = jax.jit(task.step)(state, jnp.zeros((2, 8)))
    assert res.obs.shape == (2, 60)
    assert res.extras["time_outs"].shape == (2,)
