"""Round-5 root-cause regressions: factory passive damping / limitless
wrist, per-body rigid damping, terrain surface normals, allegro cube spawn.
"""
import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest


# ---------------------------------------------------------------------------
def test_factory_franka_zero_passive_damping_and_free_wrist():
    """Effort-mode factory franka: dof damping 0 (ref factory_base.py:414-416)
    and the joint-7 limit removed (factory_franka.urdf comments it out)."""
    from isaacgymenvs_ma_tpu.tasks import registry
    from isaacgymenvs_ma_tpu.utils.config import load_task_config
    cfg = load_task_config("FactoryTaskNutBoltPick", [])
    cfg["env"]["numEnvs"] = 2
    task = registry.create_task("FactoryTaskNutBoltPick", cfg, seed=0)
    m = task.model
    fd = task.franka_dofs
    assert np.allclose(np.asarray(m.dof_damping)[fd], 0.0)
    assert not bool(np.asarray(m.dof_has_limit)[fd[6]])
    # body damping present (sim.add_damping default True)
    assert task.engine.has_body_damping


def test_body_damping_decays_free_spin():
    """A freely spinning gravity-free body with angular damping slows; the
    same body without damping keeps its momentum."""
    from isaacgymenvs_ma_tpu.models.model import FREE, GEOM_BOX, ModelBuilder
    from isaacgymenvs_ma_tpu.physics.engine import (Control, PhysicsEngine,
                                                    SimParams, SimState)

    def spin(d_ang):
        b = ModelBuilder()
        b.begin_actor()
        body = b.add_body("b", -1, FREE, body_pos=(0, 0, 1.0))
        b.add_geom(body, GEOM_BOX, np.array([0.1, 0.1, 0.1]), density=1000.0,
                   contact=False, name="g")
        m = b.finalize()
        m.body_gravity = np.zeros(m.nb)
        m.body_ang_damping = np.full(m.nb, d_ang)
        m.body_lin_damping = np.zeros(m.nb)
        eng = PhysicsEngine(m, SimParams(dt=1 / 60, substeps=2,
                                         gravity=(0, 0, -9.81)),
                            ground=False)
        s = eng.default_state(1)
        va = int(m.v_adr[0])
        s = SimState(s.q, s.qd.at[:, va + 3].set(5.0))  # spin about x
        ctrl = Control(tau=jnp.zeros((1, eng.nv), jnp.float32))
        step = jax.jit(lambda st: eng.step(st, ctrl)[0])
        for _ in range(60):
            s = step(s)
        return float(jnp.abs(s.qd[0, va + 3]))

    w_free = spin(0.0)
    w_damped = spin(5.0)
    assert w_free > 4.9          # momentum conserved without damping
    assert w_damped < 0.1 * w_free


def test_terrain_normal_on_slope_plane():
    """normal_at on a planar slope matches the analytic plane normal, and
    height_and_normal agrees with height_at."""
    from isaacgymenvs_ma_tpu.physics.terrain import TerrainGrid
    hs = 0.1
    W = L = 32
    xs = np.arange(W)[:, None] * hs
    heights = jnp.asarray(np.broadcast_to(0.5 * xs, (W, L)))  # dz/dx = 0.5
    g = TerrainGrid(heights=heights, horizontal_scale=hs, origin_xy=(0.0, 0.0))
    x = jnp.asarray([1.05, 1.55])
    y = jnp.asarray([1.05, 1.55])
    n = g.normal_at(x, y)
    expect = np.array([-0.5, 0.0, 1.0])
    expect = expect / np.linalg.norm(expect)
    assert np.allclose(np.asarray(n), expect[None], atol=1e-5)
    h, n2 = g.height_and_normal(x, y)
    assert np.allclose(np.asarray(h), np.asarray(g.height_at(x, y)), atol=1e-6)
    assert np.allclose(np.asarray(n2), np.asarray(n), atol=1e-6)


def test_local_terrain_fused_normal_matches_central_difference():
    from isaacgymenvs_ma_tpu.physics.terrain import LocalTerrain
    rng = np.random.default_rng(0)
    S = 16
    patch = jnp.asarray(rng.normal(size=(2, S, S)) * 0.1)
    lt = LocalTerrain(patch=patch,
                      base_cell=jnp.zeros((2, 2), jnp.int32),
                      horizontal_scale=0.1, origin_xy=(0.0, 0.0))
    x = jnp.asarray(rng.uniform(0.3, 1.2, size=(2, 5)))
    y = jnp.asarray(rng.uniform(0.3, 1.2, size=(2, 5)))
    h, n = lt.height_and_normal(x, y)
    assert np.allclose(np.asarray(h), np.asarray(lt.height_at(x, y)),
                       atol=1e-5)
    # central difference INSIDE a bilinear cell equals the analytic gradient
    e = 1e-4
    hx = (np.asarray(lt.height_at(x + e, y)) -
          np.asarray(lt.height_at(x - e, y))) / (2 * e)
    hy = (np.asarray(lt.height_at(x, y + e)) -
          np.asarray(lt.height_at(x, y - e))) / (2 * e)
    nn = np.stack([-hx, -hy, np.ones_like(hx)], -1)
    nn = nn / np.linalg.norm(nn, axis=-1, keepdims=True)
    assert np.allclose(np.asarray(n), nn, atol=1e-3)


@pytest.mark.slow
def test_allegro_cube_rests_on_palm():
    """The cube settles ON the palm (not wedged beneath it) and the spawn
    does not eject it (the old spawn interpenetrated the knuckle pads and
    slammed the cube down at ~10 m/s)."""
    from isaacgymenvs_ma_tpu.tasks import registry
    from isaacgymenvs_ma_tpu.utils.config import load_task_config
    from isaacgymenvs_ma_tpu.tasks.shadow_hand import PALM_TARGET
    cfg = load_task_config("AllegroHand", [])
    cfg["env"]["numEnvs"] = 4
    task = registry.create_task("AllegroHand", cfg, seed=0)
    n, na = task.num_envs, task.num_actions
    obj = task.model.body_names.index("object")
    va = int(task.model.v_adr[obj])
    es = task.initial_state(jax.random.PRNGKey(0))
    es, _ = task.reset(es)

    @jax.jit
    def step(es):
        es, _ = task.step(es, jnp.zeros((n, na)))
        return es

    vmax = 0.0
    for t in range(120):
        es = step(es)
        vmax = max(vmax, float(jnp.abs(es.sim.qd[:, va: va + 3]).max()))
    out = task.engine.forward(es.sim)
    z = np.asarray(out.body_pos[:, obj, 2])
    # resting ABOVE the palm anchor (0.55); the wedged-under state was ~0.51
    assert (z > PALM_TARGET[2] - 0.005).all(), z
    assert vmax < 6.0, f"spawn ejection: max |v| {vmax}"
