"""AllegroHand in-hand cube reorientation (reference tasks/allegro_hand.py,
732 LoC) — act 16, obs per type {full_no_vel: 50, full: 72, full_state: 88}.

16-dof Allegro hand analog of ShadowHand (same reward/goal machinery, obs-type
dict ref :108-126).  Kinematics/inertia parsed from the kuka_allegro URDF
(mesh collisions approximated by palm + fingertip contact boxes/spheres).
"""
from __future__ import annotations

import copy

import numpy as np

from ..models.model import (DRIVE_POS, FREE, GEOM_BOX, GEOM_SPHERE, Geom,
                            ModelBuilder, compose_scene, model_from_spec)
from ..physics.engine import PhysicsEngine
from ..utils.config import deep_merge
from .shadow_hand import ShadowHand, TASK_CFG as SH_CFG

TASK_CFG = deep_merge(SH_CFG, {
    "name": "AllegroHand",
    # 30 Hz policy over the 60 Hz sim (ref cfg/task/AllegroHand.yaml:24)
    "env": {"numEnvs": 8192, "observationType": "full_state",
            "controlFrequencyInv": 2},
})

FINGERTIPS = ["index_biotac_tip", "middle_biotac_tip", "ring_biotac_tip",
              "thumb_biotac_tip"]
OBS_DIMS = {"openai": 42, "full_no_vel": 50, "full": 72, "full_state": 88}


class AllegroHand(ShadowHand):
    num_hand_dofs = 16
    num_hand_actuated = 16
    fingertip_names = FINGERTIPS
    obs_dims = OBS_DIMS
    # allegro obs layouts have no fingertip-state block (ref
    # allegro_hand.py compute_full_state: 72:88 is the action history)
    obs_include_fingertips = False

    def create_model(self):
        from ..models.specs.allegro_hand import SPEC
        hand = model_from_spec(copy.deepcopy(SPEC))
        # reference dof-prop override (allegro_hand.py:263-267): kp 3,
        # kd 0.1, DRIVE force limit 0.5 N*m, joint friction 0.01,
        # armature 0.001 — the force limit is what makes kp=3 position
        # drives gentle enough to manipulate rather than slap
        hand.dof_friction = np.full(hand.nv, 0.01)
        for d in range(hand.nv):
            hand.dof_drive_mode[d] = DRIVE_POS
            hand.dof_stiffness[d] = 3.0
            hand.dof_drive_damping[d] = 0.1
            hand.dof_effort_limit[d] = 0.5
            hand.dof_armature[d] = 0.001
        # contact approximations: palm box + fingertip spheres.
        # palm_link frame (measured from the URDF mesh bbox + fk at q=0):
        # the palm body mesh occupies z in [-0.098, 0], fingers attach at
        # z~-0.011 and extend distally along +x, flexion curls fingertips
        # toward +z — the palmar surface is the z=0 top face.  The box is a
        # thin slab on that face; round 2's box ([-0.01,0,0.05] half
        # [.02,.05,.06]) stood perpendicular to it, a phantom wall occupying
        # the space where the cube must sit.
        palm = hand.body_names.index("palm_link")
        hand.geoms.append(Geom(body=palm, gtype=GEOM_BOX,
                               size=np.array([0.05, 0.058, 0.0075]),
                               pos=np.array([-0.008, 0.009, -0.0075]),
                               quat=np.array([0.0, 0, 0, 1]), friction=1.0,
                               contact=True, name="palm_box"))
        # Thick fill slab continuing below the thin palmar slab (the real
        # palm mesh is solid down to z=-0.098): a cube corner falling at
        # ~1 m/s crosses the 1.5 cm slab in two substeps, reads "outside"
        # beneath it, and the cube wedges UNDER the palm out of every
        # fingertip's reach — the frozen-cube state behind four rounds of
        # Allegro non-reorientation.  (palm_box itself stays thin: it is
        # the _palm_up_placement alignment anchor.)
        hand.geoms.append(Geom(body=palm, gtype=GEOM_BOX,
                               size=np.array([0.05, 0.058, 0.035]),
                               pos=np.array([-0.008, 0.009, -0.05]),
                               quat=np.array([0.0, 0, 0, 1]), friction=1.0,
                               contact=True, name="palm_fill"))
        for n in FINGERTIPS:
            b = hand.body_names.index(n)
            hand.geoms.append(Geom(body=b, gtype=GEOM_SPHERE,
                                   size=np.array([0.012, 0, 0]),
                                   pos=np.zeros(3),
                                   quat=np.array([0.0, 0, 0, 1]), friction=1.0,
                                   contact=True, name=f"tip_{n}"))
        # phalanx contact spheres — the reference simulates the full link
        # collision meshes (allegro_touch_sensor.urdf), so the cube can be
        # cradled/rolled by ANY part of a finger.  With only 4 tip points
        # (rounds 1-3a), the resting cube touched nothing but the palm slab
        # and the learned optimum was to never disturb it: its orientation
        # stayed frozen for entire episodes.  One mid-link sphere per
        # proximal/medial segment (links extend along local +x; thumb_link_1
        # extends along +z) makes the whole finger tangible.
        for body, off, r in [
            ("index_link_1", (0.027, 0, 0), 0.0134),
            ("index_link_2", (0.019, 0, 0), 0.0134),
            ("middle_link_1", (0.027, 0, 0), 0.0134),
            ("middle_link_2", (0.019, 0, 0), 0.0134),
            ("ring_link_1", (0.027, 0, 0), 0.0134),
            ("ring_link_2", (0.019, 0, 0), 0.0134),
            ("thumb_link_1", (0.0, 0, 0.0275), 0.0134),
            ("thumb_link_2", (0.0255, 0, 0), 0.0134),
        ]:
            bidx = hand.body_names.index(body)
            hand.geoms.append(Geom(body=bidx, gtype=GEOM_SPHERE,
                                   size=np.array([r, 0, 0]),
                                   pos=np.asarray(off, float),
                                   quat=np.array([0.0, 0, 0, 1]), friction=1.0,
                                   contact=True, name=f"pad_{body}"))
        # self-aligning placement: the palmar surface normal is the palm
        # frame's +z (fingers extend distally along +x and curl toward +z) —
        # align it to world up so the palm face is horizontal under the cube
        # (ref allegro_hand.py:283-296 mounts the hand palm-up via the
        # composed axis-angle quat).  Round 2 aligned +x (the finger axis):
        # fingers pointed up, cube balanced on fingertips.
        from .shadow_hand import _palm_up_placement, PALM_TARGET
        base, quat = _palm_up_placement(hand, "palm_box",
                                        np.array([0.0, 0, 1.0]),
                                        distal_axis=np.array([1.0, 0, 0]),
                                        tilt=0.095)
        from ..models.model import _quat_to_mat_np
        Rq = _quat_to_mat_np(np.asarray(quat, float))
        # cube over the palm/proximal-link junction (palm-frame +x is
        # distal; ref spawns at dy=-0.19/dz=+0.06 from the hand root —
        # over the finger bases, where the resting cube touches the links).
        # Spawn height: the knuckle pad spheres top out 1.9 cm above the
        # palm anchor (0.556+0.0134 world) and the slab face at +0.0075;
        # the old +0.05 put the 3.25 cm-half cube's bottom 1.5-4 cm INSIDE
        # them — the solver ejected it downward at ~10 m/s on the first
        # step and it wedged under the palm, 10-17 cm out of every
        # fingertip's reach.  That frozen-cube state was all four rounds of
        # "Allegro never reorients" (scripts/probe_allegro_tumble.py:
        # blind-gait cube speed 0.2 rad/s before, ShadowHand-level after).
        # +0.068 clears the knuckles by ~1 cm and drops into the pocket.
        self.obj_start = (PALM_TARGET + Rq @ np.array([0.05, 0.009, 0.0])
                          + np.array([0.0, 0.0, 0.068]))
        self.goal_pos = self.obj_start + np.array([0.0, 0.0, -0.04])
        ob = ModelBuilder()
        ob.begin_actor()
        obj = ob.add_body("object", -1, FREE, body_pos=self.obj_start)
        ob.add_geom(obj, GEOM_BOX, np.full(3, 0.065 / 2), density=400.0,
                    name="object_geom")
        model = compose_scene([
            (hand, base, tuple(quat)),
            (ob.finalize(), (0, 0, 0), (0, 0, 0, 1))])
        ft = [model.body_names.index(n) for n in FINGERTIPS]
        model.sensor_body = np.asarray(ft, np.int32)
        model.sensor_pos = np.zeros((len(ft), 3))
        return model, True

    def build_engine(self, model, ground):
        names = [g.name for g in model.geoms]
        obj_geom = names.index("object_geom")
        pairs = [(names.index(n), obj_geom) for n in names
                 if n.startswith(("tip_", "pad_")) or n == "palm_box"]
        pairs.append((obj_geom, names.index("palm_box")))
        pairs.append((obj_geom, names.index("palm_fill")))
        return PhysicsEngine(model, self.sim_params, ground=ground,
                             pair_specs=pairs)

