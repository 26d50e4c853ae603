"""PhysX dof/shape-property parity features (round 3): drive-force limits,
joint dry friction, armature/effort scaling, joint-limit shifts, per-body
contact friction, restitution (reference dof_properties / rigid_shape
properties — the dextreme ADR families, AllegroHandDextremeADR.yaml:250-330).
"""
import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenvs_ma_tpu.models.model import (DRIVE_POS, FREE, HINGE,
                                              GEOM_SPHERE, ModelBuilder)
from isaacgymenvs_ma_tpu.physics.engine import (Control, PhysicsEngine,
                                                SimParams)
from isaacgymenvs_ma_tpu.utils.domain_rand import PhysScales


def _pendulum(mu=0.0, effort=2.0, kp=0.0, limited=True):
    b = ModelBuilder()
    b.begin_actor()
    kw = dict(limit_lower=-1.0, limit_upper=1.0) if limited else {}
    b.add_body("pend", -1, HINGE, jnt_axis=(0, 1, 0), mass=1.0,
               com=(0.2, 0, 0), inertia=np.eye(3) * 0.02, body_pos=(0, 0, 1.0),
               effort_limit=effort, **kw)
    m = b.finalize()
    m.dof_friction[:] = mu
    if kp:
        m.dof_drive_mode[:] = DRIVE_POS
        m.dof_stiffness[:] = kp
        m.dof_drive_damping[:] = 1.0
    return PhysicsEngine(m, SimParams(substeps=2), ground=False)


def _phys(n=1, **kw):
    one = jnp.ones((n, 1), jnp.float32)
    base = dict(mass=one, damping=one, stiffness=one, friction=one)
    base.update({k: jnp.full((n, 1), v, jnp.float32)
                 for k, v in kw.items()})
    return PhysScales(**base)


def _run(eng, ctrl, phys=None, steps=120, n=1):
    s = eng.default_state(n)
    step = jax.jit(lambda s: eng.step(s, ctrl, phys=phys)[0])
    for _ in range(steps):
        s = step(s)
    return s


def test_drive_force_limit_saturates():
    """A kp=50 position drive clamped to a tiny effort cannot hold the
    pendulum against gravity; at full effort it tracks the target."""
    eng = _pendulum(kp=50.0)
    ctrl = Control(tau=jnp.zeros((1, 1)), pos_target=jnp.full((1, 1), 0.9),
                   vel_target=None)
    strong = _run(eng, ctrl, _phys(effort=1.0))
    weak = _run(eng, ctrl, _phys(effort=0.05))
    assert abs(float(strong.q[0, 0]) - 0.9) < 0.05
    # the weak drive loses to gravity and falls to the joint limit
    assert abs(float(weak.q[0, 0]) - 1.0) < 0.01


def _swing_energy(s):
    """|qd| + |q| as a crude swing-amplitude proxy."""
    return abs(float(s.qd[0, 0])) + abs(float(s.q[0, 0]))


def test_joint_friction_damps():
    ctrl = Control(tau=jnp.zeros((1, 1)), pos_target=None, vel_target=None)
    free = _run(_pendulum(mu=0.0, limited=False), ctrl, steps=55)
    sticky = _run(_pendulum(mu=0.5, limited=False), ctrl, steps=55)
    assert _swing_energy(sticky) < _swing_energy(free) - 0.3


def test_joint_friction_scale_via_phys():
    eng = _pendulum(mu=0.1, limited=False)
    ctrl = Control(tau=jnp.zeros((1, 1)), pos_target=None, vel_target=None)
    nominal = _run(eng, ctrl, steps=55)
    scaled = _run(eng, ctrl, _phys(joint_friction=5.0), steps=55)
    assert _swing_energy(scaled) < _swing_energy(nominal) - 0.1


def test_limit_shift():
    """An upper-limit shift of -0.7 stops the kp drive at ~0.3 not 0.9."""
    eng = _pendulum(kp=50.0)
    ctrl = Control(tau=jnp.zeros((1, 1)), pos_target=jnp.full((1, 1), 0.9),
                   vel_target=None)
    s = _run(eng, ctrl, _phys(dof_upper_shift=-0.7))
    assert abs(float(s.q[0, 0]) - 0.3) < 0.02


def test_restitution_bounces():
    b = ModelBuilder()
    b.begin_actor()
    ball = b.add_body("ball", -1, FREE, mass=1.0, inertia=np.eye(3) * 0.01)
    b.add_geom(ball, GEOM_SPHERE, np.array([0.1, 0, 0]), density=0.0,
               friction=0.5, name="g")
    eng = PhysicsEngine(b.finalize(), SimParams(substeps=2), ground=True)
    ctrl = Control(tau=jnp.zeros((1, eng.nv)), pos_target=None,
                   vel_target=None)
    peaks = {}
    for e in (0.0, 0.8):
        s = eng.default_state(1)
        s = s._replace(q=s.q.at[:, 2].set(0.8))
        phys = _phys(restitution=e)
        step = jax.jit(lambda s: eng.step(s, ctrl, phys=phys)[0])
        peak, hit = 0.0, False
        for _ in range(120):
            s = step(s)
            z = float(s.q[0, 2])
            if hit:
                peak = max(peak, z)
            if z < 0.12:
                hit = True
        peaks[e] = peak
    # e=0 is dead (rests at the radius); e=0.8 visibly rebounds.  The
    # velocity-level solve under-recovers ideal bounce height (as TGS
    # does) — assert the qualitative ordering, not elastic perfection.
    assert peaks[0.0] < 0.105
    assert peaks[0.8] > 0.15


def test_per_body_friction_scale():
    """(N, nb) friction makes a slope-sliding box stick per env."""
    b = ModelBuilder()
    b.begin_actor()
    ball = b.add_body("ball", -1, FREE, mass=1.0, inertia=np.eye(3) * 0.01)
    b.add_geom(ball, GEOM_SPHERE, np.array([0.05, 0, 0]), density=0.0,
               friction=1.0, name="g")
    eng = PhysicsEngine(b.finalize(), SimParams(substeps=2), ground=True)
    n = 2
    ctrl = Control(tau=jnp.zeros((n, eng.nv)), pos_target=None,
                   vel_target=None)
    s = eng.default_state(n)
    s = s._replace(q=s.q.at[:, 2].set(0.05),
                   qd=s.qd.at[:, 0].set(2.0))       # sliding along +x
    fric = jnp.stack([jnp.full((eng.nb,), 1.0),
                      jnp.full((eng.nb,), 0.0)]).astype(jnp.float32)
    phys = PhysScales(mass=jnp.ones((n, 1)), damping=jnp.ones((n, 1)),
                      stiffness=jnp.ones((n, 1)), friction=fric)
    step = jax.jit(lambda s: eng.step(s, ctrl, phys=phys)[0])
    for _ in range(60):
        s = step(s)
    # env 0 (friction) decelerates; env 1 (frictionless) keeps sliding
    assert float(s.qd[0, 0]) < 0.8
    assert float(s.qd[1, 0]) > 1.9
