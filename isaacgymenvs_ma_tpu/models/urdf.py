"""URDF -> :class:`SceneModel` parser.

Replaces the URDF import path of the reference's external ``gym.load_asset``
(Cartpole ``tasks/cartpole.py:87-92``, BallBalance's procedurally generated
bot ``tasks/ball_balance.py:136-225``, Franka, etc.).  Supports primitive
geometries (box/sphere/cylinder-as-capsule), revolute/continuous/prismatic/
fixed/floating joints, ``<dynamics>`` damping, and joint limits.

PhysX derives missing inertia tensors from the collision shapes scaled to the
given mass; we reproduce that (the cartpole URDF gives masses but no inertia).
``fix_base_link`` mirrors ``gymapi.AssetOptions.fix_base_link``.
"""
from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Dict, Optional

import numpy as np

from .model import (
    FIXED, FREE, GEOM_BOX, GEOM_CAPSULE, GEOM_SPHERE, HINGE, SLIDE,
    ModelBuilder, SceneModel, geom_mass_props, _quat_mul_np, _quat_to_mat_np,
)


def _floats(s):
    return np.array([float(x) for x in s.split()])


def _rpy_to_quat(rpy):
    r, p, y = rpy
    cr, sr = np.cos(r / 2), np.sin(r / 2)
    cp, sp = np.cos(p / 2), np.sin(p / 2)
    cy, sy = np.cos(y / 2), np.sin(y / 2)
    return np.array(
        [
            cy * sr * cp - sy * cr * sp,
            cy * cr * sp + sy * sr * cp,
            sy * cr * cp - cy * sr * sp,
            cy * cr * cp + sy * sr * sp,
        ]
    )


def _origin(elem) -> tuple:
    o = elem.find("origin") if elem is not None else None
    if o is None:
        return np.zeros(3), np.array([0.0, 0, 0, 1])
    xyz = _floats(o.get("xyz", "0 0 0"))
    rpy = _floats(o.get("rpy", "0 0 0"))
    return xyz, _rpy_to_quat(rpy)


_JTYPES = {
    "revolute": HINGE,
    "continuous": HINGE,
    "prismatic": SLIDE,
    "fixed": FIXED,
    "floating": FREE,
}


def _parse_geometry(geom_elem):
    """Return (gtype, size) for a URDF <geometry> element, or None."""
    for g in geom_elem:
        if g.tag == "box":
            return GEOM_BOX, _floats(g.get("size")) / 2.0
        if g.tag == "sphere":
            return GEOM_SPHERE, np.array([float(g.get("radius")), 0.0, 0.0])
        if g.tag == "cylinder":
            # approximate cylinders by capsules of equal radius/length
            r = float(g.get("radius"))
            l = float(g.get("length"))
            return GEOM_CAPSULE, np.array([r, max(l / 2.0 - r, 1e-4), 0.0])
        if g.tag == "mesh":
            return None  # mesh collisions are out of scope for the contact tier
    return None


def load_urdf(path_or_text: str, fix_base_link: bool = False,
              base_pos=(0, 0, 0), base_quat=(0, 0, 0, 1),
              collapse_fixed: bool = False) -> SceneModel:
    if path_or_text.lstrip().startswith("<"):
        text = path_or_text
    else:
        with open(path_or_text) as f:
            text = f.read()
    root = ET.fromstring(text)

    links: Dict[str, ET.Element] = {l.get("name"): l for l in root.findall("link")}
    joints = root.findall("joint")
    child_of = {}
    parent_of = {}
    for j in joints:
        parent = j.find("parent").get("link")
        child = j.find("child").get("link")
        child_of.setdefault(parent, []).append(j)
        parent_of[child] = j
    roots = [name for name in links if name not in parent_of]
    assert len(roots) == 1, f"URDF must have one root link, got {roots}"

    b = ModelBuilder()
    b.begin_actor()
    link_idx: Dict[str, int] = {}

    def add_link_body(name: str, parent_idx: int, jtype: int, jaxis, jpos, body_pos, body_quat,
                      lo=None, hi=None, damping=0.0, effort=1e9, velocity=1e9):
        elem = links[name]
        idx = b.add_body(
            name, parent_idx, jtype, jnt_axis=jaxis, jnt_pos=jpos,
            body_pos=body_pos, body_quat=body_quat,
            limit_lower=lo, limit_upper=hi, damping=damping,
            effort_limit=effort, velocity_limit=velocity,
        )
        link_idx[name] = idx
        # collision geoms
        collisions = elem.findall("collision")
        geom_descrs = []
        for c in collisions:
            parsed = _parse_geometry(c.find("geometry"))
            if parsed is None:
                continue
            gtype, size = parsed
            pos, quat = _origin(c)
            geom_descrs.append((gtype, size, pos, quat))
            b.add_geom(idx, gtype, size, pos, quat, density=None)
        # mass properties
        inertial = elem.find("inertial")
        if inertial is not None:
            mass = float(inertial.find("mass").get("value"))
            ipos, iquat = _origin(inertial)
            itag = inertial.find("inertia")
            if itag is not None:
                ixx = float(itag.get("ixx", 0)); iyy = float(itag.get("iyy", 0))
                izz = float(itag.get("izz", 0)); ixy = float(itag.get("ixy", 0))
                ixz = float(itag.get("ixz", 0)); iyz = float(itag.get("iyz", 0))
                I = np.array([[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]])
                R = _quat_to_mat_np(iquat)
                b.set_body_mass(idx, mass, com=ipos, inertia=R @ I @ R.T)
            else:
                # derive from collision shapes, scaled to the given mass
                m0 = 0.0
                parts = []
                for gtype, size, pos, quat in geom_descrs:
                    m, c, i = geom_mass_props(gtype, size, 1.0)
                    parts.append((m, pos + _quat_to_mat_np(quat) @ c,
                                  _quat_to_mat_np(quat) @ i @ _quat_to_mat_np(quat).T))
                    m0 += m
                if m0 > 0:
                    s = mass / m0
                    com = sum(m * c for m, c, _ in parts) / m0
                    # inertia about combined com, then offset by inertial origin
                    I = np.zeros((3, 3))
                    for m, c, i in parts:
                        d = c - com
                        I += s * (i + m * (np.dot(d, d) * np.eye(3) - np.outer(d, d)))
                    b.set_body_mass(idx, mass, com=com + ipos, inertia=I)
                else:
                    b.set_body_mass(idx, mass, com=ipos,
                                    inertia=np.eye(3) * (2.0 / 5.0) * mass * 0.01)
        return idx

    def recurse(name: str, parent_idx: int):
        for j in child_of.get(name, []):
            child = j.find("child").get("link")
            jtype = _JTYPES[j.get("type")]
            body_pos, body_quat = _origin(j)
            ax = j.find("axis")
            jaxis = _floats(ax.get("xyz")) if ax is not None else np.array([1.0, 0, 0])
            n = np.linalg.norm(jaxis)
            jaxis = jaxis / n if n > 0 else np.array([1.0, 0, 0])
            lim = j.find("limit")
            lo = hi = None
            effort = velocity = 1e9
            if lim is not None:
                if lim.get("lower") is not None:
                    lo = float(lim.get("lower"))
                if lim.get("upper") is not None:
                    hi = float(lim.get("upper"))
                effort = float(lim.get("effort", 1e9))
                velocity = float(lim.get("velocity", 1e9))
            if j.get("type") == "continuous":
                lo = hi = None
            dyn = j.find("dynamics")
            damping = float(dyn.get("damping", 0)) if dyn is not None else 0.0
            cidx = add_link_body(child, parent_idx, jtype, jaxis, np.zeros(3),
                                 body_pos, body_quat, lo, hi, damping, effort, velocity)
            recurse(child, cidx)

    root_name = roots[0]
    root_jtype = FIXED if fix_base_link else FREE
    ridx = add_link_body(root_name, -1, root_jtype, np.array([0.0, 0, 1]), np.zeros(3),
                         np.asarray(base_pos, np.float64), np.asarray(base_quat, np.float64))
    recurse(root_name, ridx)
    return b.finalize()
