"""Parity of the batch-lane fused dynamics chain (physics/dyn_kernel.py)
against the reference-layout XLA implementation in physics/engine.py.

The batch-last functions are the exact code the TPU Pallas kernel runs; on
CPU we check them unfused, plus once through pallas_call(interpret=True) to
cover the grid/BlockSpec plumbing and the full-substep integration branch.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from isaacgymenvs_ma_tpu.physics import dyn_kernel as dk
from isaacgymenvs_ma_tpu.physics.engine import spd_inverse
from isaacgymenvs_ma_tpu.tasks.ant import Ant, TASK_CFG
from isaacgymenvs_ma_tpu.utils.config import deep_merge


@pytest.fixture(scope="module")
def ant():
    task = Ant(deep_merge(TASK_CFG, {"env": {"numEnvs": 8}}))
    eng = task.engine
    key = jax.random.PRNGKey(3)
    state = task.initial_state(key)
    # a couple of steps so the state is generic (contacts, velocities)
    acts = jax.random.uniform(key, (8, task.num_actions), minval=-1, maxval=1)
    for _ in range(3):
        state, _ = task.step(state, acts)
    return task, eng, state.sim


def _inputs(eng, sim):
    q, qd = sim.q, sim.qd
    body_x, body_q = eng.fk(q)
    S = eng.dof_motion(body_x, body_q)
    N = q.shape[0]
    key = jax.random.PRNGKey(0)
    rhs = jax.random.normal(key, (N, eng.nv), jnp.float32)
    diag = jnp.broadcast_to(
        eng.dof_armature + 0.1, (N, eng.nv)).astype(jnp.float32)
    return q, qd, body_x, body_q, S, rhs, diag


def _bl(x):
    return jnp.moveaxis(x, 0, -1)


def test_chain_parity(ant):
    task, eng, sim = ant
    q, qd, body_x, body_q, S, rhs, diag = _inputs(eng, sim)
    plan = dk.get_plan(eng)
    consts = {k: jnp.asarray(v) for k, v in plan.consts().items()}

    # reference layout
    I_O_ref, _ = eng.spatial_inertia(body_x, body_q)
    M_ref = eng.mass_matrix(S, I_O_ref)
    V_ref = eng.body_velocities(S, qd)
    C_ref = eng.bias_force(S, qd, V_ref, I_O_ref)
    H_ref = M_ref + eng._diag_embed(diag)
    Hinv_ref = spd_inverse(H_ref)
    qdd_ref = jnp.einsum("nij,nj->ni", Hinv_ref, rhs - C_ref)

    # batch-last
    qdd, Hinv, I_O = dk.dyn_full_bl(
        plan, consts, _bl(body_x), _bl(body_q), _bl(S), _bl(qd), _bl(rhs), _bl(diag))

    np.testing.assert_allclose(
        np.moveaxis(np.asarray(I_O), -1, 0), np.asarray(I_O_ref),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(Hinv), -1, 0), np.asarray(Hinv_ref),
        rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(qdd), -1, 0), np.asarray(qdd_ref),
        rtol=2e-4, atol=2e-4)

    # cached variant: same C path given the same (I_O, Hinv) and a fresh
    # gravity wrench (at the SAME state it equals the a0-through-I_O route)
    fg = eng.gravity_wrench(body_x, body_q)
    qdd_c = dk.dyn_cached_bl(plan, consts, _bl(S), _bl(qd), _bl(rhs), I_O,
                             Hinv, _bl(fg))
    np.testing.assert_allclose(
        np.asarray(qdd_c), np.asarray(qdd), rtol=1e-5, atol=1e-5)


def test_chain_parity_with_scales(ant):
    task, eng, sim = ant
    q, qd, body_x, body_q, S, rhs, diag = _inputs(eng, sim)
    plan = dk.get_plan(eng)
    consts = {k: jnp.asarray(v) for k, v in plan.consts().items()}
    N = q.shape[0]
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    mass_scale = jax.random.uniform(k1, (N, eng.nb), minval=0.6, maxval=1.5)
    shape_scale = jax.random.uniform(
        k2, (N, eng.nb, 3), minval=0.7, maxval=1.4)

    I_O_ref, _ = eng.spatial_inertia(body_x, body_q, mass_scale, shape_scale)
    M_ref = eng.mass_matrix(S, I_O_ref)

    I_O = dk.spatial_inertia_bl(
        plan, consts, _bl(body_x), _bl(body_q), _bl(mass_scale), _bl(shape_scale))
    M = dk.mass_matrix_bl(plan, consts, _bl(S), I_O)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(I_O), -1, 0), np.asarray(I_O_ref),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(M), -1, 0), np.asarray(M_ref),
        rtol=1e-5, atol=1e-5)


def test_full_step_parity_interpret():
    """engine.step through the kernel branch (interpret mode) matches the
    fallback XLA path on the same state."""
    N = 128  # minimum lane block
    task = Ant(deep_merge(TASK_CFG, {"env": {"numEnvs": N}}))
    state = task.initial_state(jax.random.PRNGKey(5))
    acts = jax.random.uniform(
        jax.random.PRNGKey(6), (N, task.num_actions), minval=-1, maxval=1)

    state_ref, res_ref = task.step(state, acts)
    dk._FORCE_INTERPRET = True
    try:
        assert dk.supports(task.engine, N, jnp.float32)
        state_k, res_k = task.step(state, acts)
    finally:
        dk._FORCE_INTERPRET = False
    np.testing.assert_allclose(
        np.asarray(state_k.sim.q), np.asarray(state_ref.sim.q),
        rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(state_k.sim.qd), np.asarray(state_ref.sim.qd),
        rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(res_k.obs), np.asarray(res_ref.obs),
        rtol=2e-3, atol=2e-3)


def _step_parity(task_name, overrides, n=128, atol=3e-3, rtol=3e-3):
    from isaacgymenvs_ma_tpu.tasks import registry
    from isaacgymenvs_ma_tpu.utils.config import deep_merge
    cfg = deep_merge(registry.task_default_config(task_name),
                     {"env": {"numEnvs": n}, **overrides})
    task = registry.create_task(task_name, cfg)
    state = task.initial_state(jax.random.PRNGKey(11))
    acts = jax.random.uniform(
        jax.random.PRNGKey(12), (task.rl_games_batch, task.num_actions),
        minval=-1, maxval=1)
    state_ref, res_ref = task.step(state, acts)
    dk._FORCE_INTERPRET = True
    try:
        state_k, res_k = task.step(state, acts)
    finally:
        dk._FORCE_INTERPRET = False
    np.testing.assert_allclose(
        np.asarray(state_k.sim.qd), np.asarray(state_ref.sim.qd),
        rtol=rtol, atol=atol)
    np.testing.assert_allclose(
        np.asarray(res_k.obs), np.asarray(res_ref.obs), rtol=rtol, atol=atol)


def test_step_parity_ball_balance_interpret():
    """Pair rows (ball-vs-tray), tangent frames, and attractor rows through
    the contact kernel (BallBalance — ball_balance.py:306-320 attractors)."""
    _step_parity("BallBalance", {})


@pytest.mark.slow
def test_step_parity_factory_pick_interpret():
    """Grab (suction) rows + SDF pair rows through the contact kernel."""
    _step_parity("FactoryTaskNutBoltPick", {})


def test_plan_not_shared_across_engines():
    """Regression: the kernel plan was cached in a global dict keyed by
    id(engine); a recycled id after GC handed a new engine another model's
    plan (bench-suite crash: BallBalance stepped with Anymal's plan)."""
    import gc
    from isaacgymenvs_ma_tpu.tasks import registry
    from isaacgymenvs_ma_tpu.utils.config import deep_merge

    def build(name):
        cfg = deep_merge(registry.task_default_config(name),
                         {"env": {"numEnvs": 4}})
        t = registry.create_task(name, cfg)
        return t, dk.get_plan(t.engine)

    t1, p1 = build("Ant")
    nv1 = p1.nv
    del t1, p1
    gc.collect()
    t2, p2 = build("BallBalance")
    assert p2.nv == t2.engine.nv != nv1
    assert dk.get_plan(t2.engine) is p2          # stable per engine


def test_fk_motion_kernel_parity():
    """Fused FK + motion-subspace kernel matches engine.fk/dof_motion to
    machine epsilon across joint types (FREE/HINGE/SLIDE/FIXED/SCREW)."""
    import jax
    import jax.numpy as jnp
    from isaacgymenvs_ma_tpu.physics import dyn_kernel as dk
    from isaacgymenvs_ma_tpu.tasks import registry
    from isaacgymenvs_ma_tpu.utils.config import load_task_config

    old = dk._FORCE_INTERPRET
    dk._FORCE_INTERPRET = True
    try:
        for name in ("Ant", "FactoryTaskNutBoltScrew"):
            cfg = load_task_config(name, [])
            cfg["env"]["numEnvs"] = 128
            t = registry.create_task(name, cfg, seed=0)
            es = t.initial_state(jax.random.PRNGKey(0))
            es, _ = t.reset(es)
            q = es.sim.q + 0.01 * jax.random.normal(
                jax.random.PRNGKey(1), es.sim.q.shape)
            bx0, bq0 = t.engine.fk(q)
            S0 = t.engine.dof_motion(bx0, bq0)
            bx1, bq1, S1 = dk.fk_motion_pallas(t.engine, q)
            assert float(jnp.abs(bx1 - bx0).max()) < 1e-5
            assert float(jnp.abs(bq1 - bq0).max()) < 1e-5
            assert float(jnp.abs(S1 - S0).max()) < 1e-5
    finally:
        dk._FORCE_INTERPRET = old
