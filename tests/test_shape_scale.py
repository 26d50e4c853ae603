"""Per-env object-dimension randomization (PhysScales.shape).

The reference implements cuboid-size DR by generating one URDF per size and
assigning a different asset to each env (allegro_kuka/generate_cuboids.py:38-81,
allegro_kuka_base.py:414-428).  Here geometry scale is a per-env batched leaf
consumed by the engine's narrowphase and inertia computation; these tests
anchor its physics: resting heights scale with the geometry, and the spatial
inertia transforms exactly (m x sx*sy*sz, covariance-scaled I).
"""
import numpy as np
import jax
import jax.numpy as jnp

from isaacgymenvs_ma_tpu.models.model import (
    ModelBuilder, FREE, GEOM_SPHERE, GEOM_BOX)
from isaacgymenvs_ma_tpu.physics.engine import (
    PhysicsEngine, SimParams, Control, SimState)
from isaacgymenvs_ma_tpu.utils.domain_rand import PhysScales


def _rollout(eng, st, ctrl, n, phys):
    @jax.jit
    def run(st):
        def body(s, _):
            s, _ = eng.step(s, ctrl, phys=phys)
            return s, None
        s, _ = jax.lax.scan(body, st, None, length=n)
        return s
    return run(st)


def _phys_with_shape(n, nb, shape):
    base = PhysScales.ones(n)
    return base._replace(shape=jnp.asarray(shape, jnp.float32))


def test_sphere_resting_height_scales():
    b = ModelBuilder()
    root = b.add_body("ball", -1, FREE)
    b.add_geom(root, GEOM_SPHERE, [0.1, 0, 0], density=200.0)
    eng = PhysicsEngine(b.finalize(), SimParams(dt=1 / 60, substeps=2))
    st = eng.default_state(2)
    st = SimState(st.q.at[:, 2].set(0.5), st.qd)  # drop from 0.5 m
    ctrl = Control(tau=jnp.zeros((2, eng.nv)))
    shape = jnp.stack([jnp.ones((1, 3)), jnp.full((1, 3), 2.0)])  # (2, nb, 3)
    st = _rollout(eng, st, ctrl, 240, _phys_with_shape(2, 1, shape))
    z = np.asarray(st.q[:, 2])
    assert abs(z[0] - 0.1) < 0.02, z   # nominal radius
    assert abs(z[1] - 0.2) < 0.03, z   # doubled radius


def test_box_anisotropic_resting_height():
    b = ModelBuilder()
    root = b.add_body("box", -1, FREE)
    b.add_geom(root, GEOM_BOX, [0.05, 0.05, 0.05], density=500.0)
    eng = PhysicsEngine(b.finalize(), SimParams(dt=1 / 60, substeps=2))
    st = eng.default_state(2)
    st = SimState(st.q.at[:, 2].set(0.3), st.qd)
    ctrl = Control(tau=jnp.zeros((2, eng.nv)))
    # env 1 scales only z by 3: corners at z = +-0.15
    shape = jnp.stack([jnp.ones((1, 3)),
                       jnp.asarray([[1.0, 1.0, 3.0]])])
    st = _rollout(eng, st, ctrl, 240, _phys_with_shape(2, 1, shape))
    z = np.asarray(st.q[:, 2])
    assert abs(z[0] - 0.05) < 0.02, z
    assert abs(z[1] - 0.15) < 0.03, z


def test_spatial_inertia_exact_scaling():
    b = ModelBuilder()
    root = b.add_body("box", -1, FREE)
    b.add_geom(root, GEOM_BOX, [0.1, 0.2, 0.3], density=100.0)
    m = b.finalize()
    eng = PhysicsEngine(m, SimParams(dt=1 / 60, substeps=1), ground=False)
    body_x = jnp.zeros((1, 1, 3))
    body_q = jnp.asarray([[[0.0, 0, 0, 1]]])
    s = np.array([1.5, 0.7, 2.0])
    I_s, _ = eng.spatial_inertia(
        body_x, body_q, shape_scale=jnp.asarray(s)[None, None, :])

    # reference: rebuild the model with the scaled box directly
    b2 = ModelBuilder()
    r2 = b2.add_body("box", -1, FREE)
    b2.add_geom(r2, GEOM_BOX, np.array([0.1, 0.2, 0.3]) * s, density=100.0)
    eng2 = PhysicsEngine(b2.finalize(), SimParams(dt=1 / 60, substeps=1),
                         ground=False)
    I_ref, _ = eng2.spatial_inertia(body_x, body_q)
    np.testing.assert_allclose(np.asarray(I_s), np.asarray(I_ref),
                               rtol=1e-5, atol=1e-7)


def test_pair_contact_scaled_target():
    """A sphere resting on a per-env scaled box (pair narrowphase)."""
    b = ModelBuilder()
    tray = b.add_body("tray", -1, FREE)
    g_tray = b.add_geom(tray, GEOM_BOX, [0.5, 0.5, 0.05], density=5000.0)
    b.begin_actor()
    ball = b.add_body("ball", -1, FREE)
    g_ball = b.add_geom(ball, GEOM_SPHERE, [0.1, 0, 0], density=200.0)
    eng = PhysicsEngine(b.finalize(), SimParams(dt=1 / 60, substeps=2),
                        pair_specs=[(g_ball, g_tray)])
    st = eng.default_state(2)
    q = st.q
    q = q.at[:, 2].set(0.05)      # tray root at its half-thickness
    q = q.at[:, 9].set(0.6)       # ball above
    st = SimState(q, st.qd)
    ctrl = Control(tau=jnp.zeros((2, eng.nv)))
    # env 1: tray z-thickness x4 (top at 0.05*4 = 0.2 above tray origin)
    shape = jnp.stack([
        jnp.ones((2, 3)),
        jnp.asarray([[1.0, 1.0, 4.0], [1.0, 1.0, 1.0]]),
    ])
    st = _rollout(eng, st, ctrl, 240, _phys_with_shape(2, 2, shape))
    z_tray = np.asarray(st.q[:, 2])
    z_ball = np.asarray(st.q[:, 9])
    # ball rests at tray-top + radius
    assert abs(z_ball[0] - (z_tray[0] + 0.05 + 0.1)) < 0.03, (z_tray, z_ball)
    assert abs(z_ball[1] - (z_tray[1] + 0.2 + 0.1)) < 0.03, (z_tray, z_ball)


def test_scale_spec_through_domain_randomizer():
    """actor_params.<actor>.scale (Trifinger.yaml object scale) maps onto
    PhysScales.shape: setup_only sampled once, non-setup_only resampled at
    reset for masked envs only."""
    from isaacgymenvs_ma_tpu.utils.domain_rand import DomainRandomizer

    b = ModelBuilder()
    root = b.add_body("object", -1, FREE)
    b.add_geom(root, GEOM_BOX, [0.03, 0.03, 0.03], density=300.0)
    model = b.finalize()

    params = {
        "frequency": 1,
        "actor_params": {
            "object": {"scale": {"range": [0.97, 1.03],
                                 "operation": "scaling",
                                 "distribution": "uniform",
                                 "setup_only": True}},
        },
    }
    dr = DomainRandomizer(params, num_envs=64)
    dr.bind_model(model)
    shape = dr.initial_shape(jax.random.PRNGKey(0), model.nb)
    assert shape.shape == (64, 1, 3)
    s = np.asarray(shape)
    assert (s >= 0.97 - 1e-6).all() and (s <= 1.03 + 1e-6).all()
    assert s.std() > 1e-4  # actually randomized per env
    # isotropic: all three axes equal per env
    np.testing.assert_allclose(s[..., 0], s[..., 2], rtol=0, atol=0)

    # setup_only: resample keeps it fixed
    kept = dr.resample_shape(jax.random.PRNGKey(1),
                             jnp.ones(64, bool), shape)
    np.testing.assert_array_equal(np.asarray(kept), s)

    # non-setup_only: masked envs resample, others keep
    params["actor_params"]["object"]["scale"]["setup_only"] = False
    dr2 = DomainRandomizer(params, num_envs=64)
    dr2.bind_model(model)
    mask = jnp.arange(64) < 32
    out = np.asarray(dr2.resample_shape(jax.random.PRNGKey(2), mask, shape))
    assert (out[:32] != s[:32]).any()
    np.testing.assert_array_equal(out[32:], s[32:])
