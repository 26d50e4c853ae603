"""GEOM_SDF collision-path tests (round-2: VERDICT Weak #2).

The engine's mesh-contact model: candidate points of geom A sampled against
the baked signed-distance voxel grid of geom B (the PhysX "SDF-Based
Collisions" analog, reference docs/factory.md §Collisions and Contacts).
These tests pin the narrowphase (grid-vs-analytic agreement), the solver
(resting stability on SDF targets, incl. the mass-splitting mode dense
contact clouds need), and the mesh fidelity the Factory tier relies on
(a hex nut's bore riding a bolt shank).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaacgymenvs_ma_tpu.models import meshes
from isaacgymenvs_ma_tpu.models.model import (FIXED, FREE, GEOM_BOX,
                                              GEOM_SPHERE, ModelBuilder,
                                              compose_scene)
from isaacgymenvs_ma_tpu.physics.engine import (Control, PhysicsEngine,
                                                SimParams, SimState)

BOX_HALF = np.array([0.05, 0.04, 0.03])


def _zero_ctrl(eng, n):
    z = jnp.zeros((n, eng.nv), jnp.float32)
    return Control(tau=z, pos_target=z, vel_target=z)


def _free_sphere_over_target(target_builder, radius=0.01):
    """Scene: fixed target body at origin + a free sphere probe."""
    tb = ModelBuilder()
    tb.begin_actor()
    t = tb.add_body("target", -1, FIXED)
    target_builder(tb, t)
    ob = ModelBuilder()
    ob.begin_actor()
    probe = ob.add_body("probe", -1, FREE)
    ob.add_geom(probe, GEOM_SPHERE, np.array([radius, 0, 0]), density=1000.0,
                friction=0.5, name="probe_geom")
    m = compose_scene([(tb.finalize(), (0, 0, 0), (0, 0, 0, 1)),
                       (ob.finalize(), (0, 0, 0), (0, 0, 0, 1))])
    names = [g.name for g in m.geoms]
    return m, names


def test_mesh_generators_interior_sign():
    """Every procedural generator bakes with NEGATIVE distance inside the
    material (regression: cylinder_mesh's unflipped wall orientation made
    its whole interior read as outside, so parts fell through SDF bolts)."""
    from isaacgymenvs_ma_tpu.physics import sdf_grid
    cases = [
        ("box", meshes.box_mesh(BOX_HALF), (0.0, 0.0, 0.0), (0.09, 0.0, 0.0)),
        ("cylinder", meshes.cylinder_mesh(0.014, 0.008, n=24),
         (0.0, 0.0, 0.0), (0.025, 0.0, 0.0)),
        ("hex", meshes.cylinder_mesh(0.014, 0.008, n=6),
         (0.0, 0.0, 0.0), (0.025, 0.0, 0.0)),
        ("tube", meshes.tube_mesh(0.014, 0.007, 0.0065, n=24),
         (0.010, 0.0, 0.0), (0.025, 0.0, 0.0)),
        ("hex_nut", meshes.hex_nut_mesh(0.024, 0.013, 0.0085),
         (0.011, 0.0, 0.0), (0.025, 0.0, 0.0)),
        ("bolt", meshes.bolt_mesh(0.024, 0.016, 0.008, 0.025),
         (0.0, 0.0, 0.030), (0.02, 0.0, 0.030)),
        ("rod", meshes.threaded_rod_mesh(0.008, 0.0065, 0.0125, 0.002),
         (0.0, 0.0, 0.0), (0.015, 0.0, 0.0)),
        ("box_with_hole",
         meshes.box_with_hole_mesh((0.0145, 0.0145), 0.0125, 0.0042, n=64),
         (0.009, 0.0, 0.0), (0.025, 0.0, 0.0)),
    ]
    for name, (v, t), inside, outside in cases:
        g = sdf_grid.from_mesh(v, t, resolution=48)
        d_in = float(sdf_grid.sample(g, jnp.asarray([inside]))[0])
        d_out = float(sdf_grid.sample(g, jnp.asarray([outside]))[0])
        assert d_in < -5e-4, f"{name}: interior not negative ({d_in})"
        assert d_out > 5e-4, f"{name}: exterior not positive ({d_out})"


def test_sdf_narrowphase_matches_analytic_box():
    """Pair rows against a baked box mesh agree with the analytic box SDF
    (phi within a voxel, aligned normals) at probe points on every side."""
    def add_box(b, body):
        b.add_geom(body, GEOM_BOX, BOX_HALF, name="tgt")

    def add_sdf_box(b, body):
        v, t = meshes.box_mesh(BOX_HALF)
        b.add_sdf_geom(body, v, t, resolution=64, name="tgt")

    rows = {}
    for label, builder in (("analytic", add_box), ("sdf", add_sdf_box)):
        m, names = _free_sphere_over_target(builder)
        eng = PhysicsEngine(m, SimParams(), ground=False,
                            pair_specs=[(names.index("probe_geom"),
                                         names.index("tgt"))])
        probes = np.array([
            [0.0, 0.0, 0.045],     # above +z face
            [0.0, 0.0, -0.045],    # below -z face
            [0.065, 0.0, 0.0],     # outside +x face
            [0.0, -0.055, 0.0],    # outside -y face
            [0.0, 0.0, 0.02],      # inside, nearest +z face
            [0.09, 0.0, 0.09],     # outside corner region
        ], np.float32)
        n = len(probes)
        st = eng.default_state(n)
        q = st.q.at[:, 0:3].set(jnp.asarray(probes))
        body_x, body_q = eng.fk(q)
        p, phi, mu, mask, nrm = eng._pair_rows(body_x, body_q)
        rows[label] = (np.asarray(phi)[:, 0], np.asarray(nrm)[:, 0])

    phi_a, n_a = rows["analytic"]
    phi_s, n_s = rows["sdf"]
    # voxel pitch at resolution 64 over the padded bbox ~ 2 mm
    np.testing.assert_allclose(phi_s, phi_a, atol=3.5e-3)
    cos = np.sum(n_a * n_s, -1)
    assert (cos > 0.97).all(), f"normals disagree: cos={cos}"


def test_sphere_rests_on_sdf_box():
    """A sphere dropped onto a baked box mesh settles on its top face."""
    def add_sdf_box(b, body):
        v, t = meshes.box_mesh(BOX_HALF)
        b.add_sdf_geom(body, v, t, resolution=64, name="tgt")

    m, names = _free_sphere_over_target(add_sdf_box, radius=0.01)
    eng = PhysicsEngine(m, SimParams(num_iterations=16), ground=False,
                        pair_specs=[(names.index("probe_geom"),
                                     names.index("tgt"))])
    st = eng.default_state(1)
    st = st._replace(q=st.q.at[0, 0:3].set(jnp.asarray([0.0, 0.0, 0.06])))
    ctrl = _zero_ctrl(eng, 1)
    step = jax.jit(lambda s: eng.step(s, ctrl)[0])
    for _ in range(120):
        st = step(st)
    z = float(st.q[0, 2])
    assert abs(z - (BOX_HALF[2] + 0.01)) < 3e-3, z
    assert float(jnp.abs(st.qd).max()) < 0.05


def _nut_table_scene(mass_splitting):
    tb = ModelBuilder()
    tb.begin_actor()
    t = tb.add_body("table", -1, FIXED, body_pos=(0, 0, 0.2))
    tb.add_geom(t, GEOM_BOX, np.array([0.3, 0.3, 0.2]), friction=0.3,
                name="table_top")
    ob = ModelBuilder()
    ob.begin_actor()
    nut = ob.add_body("nut", -1, FREE)
    v, tr = meshes.hex_nut_mesh(0.024, 0.013, 0.0085)
    cp = meshes.hex_nut_contact_points(0.024, 0.013, 0.0085)
    ob.add_sdf_geom(nut, v, tr, density=7850.0, friction=0.8, resolution=40,
                    contact_points=cp, name="nut_geom")
    m = compose_scene([(tb.finalize(), (0, 0, 0), (0, 0, 0, 1)),
                       (ob.finalize(), (0, 0, 0), (0, 0, 0, 1))])
    names = [g.name for g in m.geoms]
    params = SimParams(num_iterations=32, mass_splitting=mass_splitting)
    return PhysicsEngine(m, params, ground=True,
                         pair_specs=[(names.index("nut_geom"),
                                      names.index("table_top"))])


def test_hex_nut_cloud_rests_with_mass_splitting():
    """The 36-point hex-nut cloud rests on the table only under Jacobi mass
    splitting — without it, coincident rows overshoot (R*relaxation > 2)."""
    eng = _nut_table_scene(mass_splitting=True)
    st = eng.default_state(1)
    st = st._replace(q=st.q.at[0, 0:3].set(jnp.asarray([0.0, 0.0, 0.42])))
    step = jax.jit(lambda s: eng.step(s, _zero_ctrl(eng, 1))[0])
    for _ in range(120):
        st = step(st)
    assert abs(float(st.q[0, 2]) - 0.4065) < 3e-3, float(st.q[0, 2])
    assert float(jnp.abs(st.qd).max()) < 0.05

    # contrast: plain Jacobi on the same scene diverges or tunnels — this is
    # the regression the flag exists for, so pin the failure mode loosely
    eng0 = _nut_table_scene(mass_splitting=False)
    st0 = eng0.default_state(1)
    st0 = st0._replace(q=st0.q.at[0, 0:3].set(jnp.asarray([0.0, 0.0, 0.42])))
    step0 = jax.jit(lambda s: eng0.step(s, _zero_ctrl(eng0, 1))[0])
    for _ in range(120):
        st0 = step0(st0)
    settled = (abs(float(st0.q[0, 2]) - 0.4065) < 3e-3
               and float(jnp.abs(st0.qd).max()) < 0.05)
    assert not settled, "plain Jacobi now handles dense clouds: re-evaluate " \
        "whether mass_splitting is still needed"


def test_hex_nut_bore_rides_bolt_shank():
    """Mesh fidelity: a nut dropped over the bolt shank stays centered on it
    (the bore constrains XY) and comes to rest on the bolt head — impossible
    with the old box-nut/cylinder-bolt primitive proxies."""
    bb = ModelBuilder()
    bb.begin_actor()
    bolt = bb.add_body("bolt", -1, FIXED)
    head, shank = meshes.bolt_mesh_parts(0.024, 0.016, 0.008, 0.025)
    bb.add_sdf_geom(bolt, head[0], head[1], friction=0.3, resolution=64,
                    union_with=[shank], name="bolt_geom")
    ob = ModelBuilder()
    ob.begin_actor()
    nut = ob.add_body("nut", -1, FREE)
    v, tr = meshes.hex_nut_mesh(0.024, 0.013, 0.0085)
    cp = meshes.hex_nut_contact_points(0.024, 0.013, 0.0085)
    ob.add_sdf_geom(nut, v, tr, density=7850.0, friction=0.1, resolution=40,
                    contact_points=cp, name="nut_geom")
    m = compose_scene([(bb.finalize(), (0, 0, 0), (0, 0, 0, 1)),
                       (ob.finalize(), (0, 0, 0), (0, 0, 0, 1))])
    names = [g.name for g in m.geoms]
    eng = PhysicsEngine(m, SimParams(num_iterations=32, mass_splitting=True),
                        ground=True,
                        pair_specs=[(names.index("nut_geom"),
                                     names.index("bolt_geom"))])
    st = eng.default_state(1)
    # nut slightly off-center around the shank tip, above the bolt
    st = st._replace(q=st.q.at[0, 0:3].set(jnp.asarray([0.002, 0.0, 0.045])))
    step = jax.jit(lambda s: eng.step(s, _zero_ctrl(eng, 1))[0])
    for _ in range(200):
        st = step(st)
    x, y, z = (float(st.q[0, 0]), float(st.q[0, 1]), float(st.q[0, 2]))
    # bore (r 8.5 mm) around the shank (r 8 mm): |xy| bounded by the
    # clearance; nut rests on the head (top at 0.016, nut half-height 6.5 mm)
    # clearance 0.5 mm + hex-bore sampling + voxel slop: stays within a few
    # mm of the axis (the box proxy either rested on top or fell clear off)
    assert np.hypot(x, y) < 4e-3, (x, y)
    assert 0.016 < z < 0.030, z
    assert float(jnp.abs(st.qd).max()) < 0.2


@pytest.mark.slow
def test_factory_pick_uses_sdf_pairs():
    """FactoryTaskNutBoltPick (default cfg) builds GEOM_SDF pair targets and
    steps finitely with the nut resting on the table."""
    import isaacgymenvs_ma_tpu as ig
    from isaacgymenvs_ma_tpu.models.model import GEOM_SDF
    task = ig.make(seed=0, task="FactoryTaskNutBoltPick", num_envs=2)
    tgt_types = [p["tgt_type"] for p in task.engine.pairs]
    assert GEOM_SDF in tgt_types
    st = task.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(task.step)
    for _ in range(20):
        st, res = step(st, jnp.zeros((2, task.num_actions)))
    assert bool(jnp.all(jnp.isfinite(st.sim.q)))


@pytest.mark.slow
def test_industreal_socket_is_sdf_collision_target():
    """IndustRealTaskPegsInsert collides the peg against the real socket
    solid (block-minus-bore SDF), not a rim approximation."""
    import isaacgymenvs_ma_tpu as ig
    from isaacgymenvs_ma_tpu.models.model import GEOM_SDF
    task = ig.make(seed=0, task="IndustRealTaskPegsInsert", num_envs=2)
    names = [g.name for g in task.model.geoms]
    assert "socket_sdf" in names
    assert any(p["tgt_type"] == GEOM_SDF for p in task.engine.pairs)
    st = task.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(task.step)
    for _ in range(20):
        st, res = step(st, jnp.zeros((2, task.num_actions)))
    assert bool(jnp.all(jnp.isfinite(st.sim.q)))
