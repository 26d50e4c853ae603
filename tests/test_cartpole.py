"""Cartpole parity tests: engine vs independent Lagrangian dynamics, plus
env-runtime semantics (auto-reset protocol, reward kernel, episode clock)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaacgymenvs_ma_tpu.tasks.cartpole import Cartpole, TASK_CFG, build_cartpole_model
from isaacgymenvs_ma_tpu.physics.engine import PhysicsEngine, SimParams, Control, SimState
from isaacgymenvs_ma_tpu.utils.config import deep_merge


def make_task(num_envs=8):
    cfg = deep_merge(TASK_CFG, {"env": {"numEnvs": num_envs}})
    return Cartpole(cfg)


def analytic_cartpole(x, th, xd, thd, F, h, n_steps):
    """Independent Lagrangian cartpole, semi-implicit Euler.

    Cart slides along +y; pole hinge about +x; theta>0 tips the pole com
    toward -y (R_x(th) @ (0,0,l) = (0, -l sin th, l cos th)).
    """
    M, m, l = 1.0, 1.0, 0.47
    I_com = (0.06**2 + 1.0**2) / 12.0
    g = 9.81
    for _ in range(n_steps):
        A = np.array([[M + m, -m * l * np.cos(th)],
                      [-m * l * np.cos(th), I_com + m * l * l]])
        b = np.array([F - m * l * np.sin(th) * thd * thd,
                      m * g * l * np.sin(th)])
        xdd, thdd = np.linalg.solve(A, b)
        xd += h * xdd
        thd += h * thdd
        thd = np.clip(thd, -8.0, 8.0)  # pole dof velocity limit (urdf)
        x += h * xd
        th += h * thd
    return x, th, xd, thd


@pytest.mark.parametrize("force", [0.0, 20.0])
def test_cartpole_dynamics_vs_lagrangian(force):
    model = build_cartpole_model()
    h = 1.0 / 120.0
    eng = PhysicsEngine(model, SimParams(dt=h, substeps=1), ground=False)
    st = eng.default_state(1)
    st = SimState(st.q.at[:, 1].set(0.2), st.qd)  # pole angle 0.2
    ctrl = Control(tau=jnp.array([[force, 0.0]]))

    @jax.jit
    def run(st):
        def body(s, _):
            s, _ = eng.step(s, ctrl)
            return s, None
        return jax.lax.scan(body, st, None, length=80)[0]

    # 80 steps stays below the pole's 8 rad/s dof velocity limit, which the
    # engine enforces (URDF <limit velocity=...>) but the analytic model lacks.
    st = run(st)
    x, th, xd, thd = analytic_cartpole(0.0, 0.2, 0.0, 0.0, force, h, 80)
    assert abs(float(st.q[0, 0]) - x) < 5e-3, (float(st.q[0, 0]), x)
    assert abs(float(st.q[0, 1]) - th) < 5e-3, (float(st.q[0, 1]), th)
    assert abs(float(st.qd[0, 0]) - xd) < 2e-2
    assert abs(float(st.qd[0, 1]) - thd) < 2e-2


def test_cartpole_env_loop():
    task = make_task(16)
    key = jax.random.PRNGKey(0)
    state = task.initial_state(key)

    @jax.jit
    def run(state, key):
        def body(carry, _):
            state, key = carry
            key, k = jax.random.split(key)
            actions = jax.random.uniform(k, (16, 1), minval=-1.0, maxval=1.0)
            state, res = task.step(state, actions)
            return (state, key), (res.rew, res.reset, res.obs)
        (state, _), (rews, resets, obs) = jax.lax.scan(body, (state, key), None, length=520)
        return state, rews, resets, obs

    state, rews, resets, obs = run(state, jax.random.PRNGKey(1))
    rews, resets, obs = map(np.asarray, (rews, resets, obs))
    assert np.isfinite(rews).all() and np.isfinite(obs).all()
    # first step resets every env (reset_buf initialized to 1)
    # reward kernel range: within [-2, 1]
    assert rews.max() <= 1.0 + 1e-5 and rews.min() >= -2.0 - 1e-5
    # episode clock fires at least once over 520 steps
    assert resets.any()
    # obs clipped at 5.0
    assert np.abs(obs).max() <= 5.0 + 1e-5
    # all pole angles within physical range after resets
    assert np.abs(np.asarray(state.sim.q)[:, 0]).max() <= 4.0


def test_cartpole_reset_distribution():
    task = make_task(512)
    state = task.initial_state(jax.random.PRNGKey(0))
    state, res = jax.jit(task.step)(state, task.zero_actions())
    dof_pos = np.asarray(task.engine.dof_pos(state.sim))
    # reset draws pos ~ U(-0.1, 0.1) (ref cartpole.py:144-149)
    assert np.abs(dof_pos).max() <= 0.1 + 0.05  # one step of drift allowance
    assert dof_pos.std() > 0.02


def test_cartpole_balances_under_pd():
    """A hand PD controller should keep the pole near upright — sanity that
    the plant is controllable like the reference's."""
    task = make_task(4)
    state = task.initial_state(jax.random.PRNGKey(2))
    state, _ = jax.jit(task.step)(state, task.zero_actions())  # initial reset

    @jax.jit
    def run(state):
        def body(s, _):
            dof_pos = task.engine.dof_pos(s.sim)
            dof_vel = task.engine.dof_vel(s.sim)
            # max force is 400 N on a 2 kg system — gains must be tiny
            a = -(0.8 * dof_pos[:, 1] + 0.15 * dof_vel[:, 1]) \
                + 0.01 * dof_pos[:, 0] + 0.03 * dof_vel[:, 0]
            s, res = task.step(s, jnp.clip(a, -1, 1)[:, None])
            return s, res.obs
        return jax.lax.scan(body, state, None, length=400)
    state, obs = run(state)
    final_angle = np.abs(np.asarray(obs)[-50:, :, 2])
    assert final_angle.max() < 0.2, final_angle.max()
