"""Motion library for AMP (reference tasks/amp/utils_amp/motion_lib.py, 323
LoC + the poselib runtime surface it depends on).

Loads ``SkeletonMotion`` .npy files (plain numpy dicts: per-frame local
rotations, root translation, global velocities, skeleton tree — the poselib
serialization format), converts local joint rotations to the humanoid's 28-dof
coordinates (3-hinge exp-map clusters + 1-dof knees/elbows —
``_local_rotation_to_dof``, motion_lib.py:221-248), computes key-body
positions by skeleton FK, and **resamples every motion to the control-dt
grid** at load time so runtime sampling is a uniform-grid lerp under jit
(replaces frame-interpolated ``get_motion_state`` :83-153).

Runtime API (all jit-safe): ``sample_motions``, ``sample_time``,
``get_motion_state(ids, times)``, ``sample_amp_obs_pairs`` for demo
transitions.
"""
from __future__ import annotations

import os
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import maths

# amp_humanoid dof layout (reference tasks/amp/humanoid_amp_base.py:41-47)
DOF_BODY_IDS = [1, 2, 3, 4, 6, 7, 9, 10, 11, 12, 13, 14]
DOF_OFFSETS = [0, 3, 6, 9, 10, 13, 14, 17, 18, 21, 24, 25, 28]
KEY_BODY_NAMES = ["right_hand", "left_hand", "right_foot", "left_foot"]
NUM_DOF = DOF_OFFSETS[-1]

# single-dof joints rotate about these local axes (knees/elbows in
# amp_humanoid.xml; the reference extracts the same components)
_1DOF_AXIS = {4: 1, 7: 1, 10: 1, 13: 1}  # body_id -> axis idx (y)


def _quat_to_exp_np(q):
    sin_half = np.linalg.norm(q[..., 0:3], axis=-1)
    angle = 2.0 * np.arctan2(sin_half, q[..., 3])
    angle = np.arctan2(np.sin(angle), np.cos(angle))
    axis = q[..., 0:3] / np.maximum(sin_half, 1e-9)[..., None]
    axis = np.where((sin_half > 1e-5)[..., None], axis,
                    np.array([0.0, 0, 1.0]))
    return angle[..., None] * axis


def _fk_positions(parents, local_t, root_pos, local_rot):
    """Global body positions from local rotations (poselib FK semantics)."""
    T, nb = local_rot.shape[0], local_rot.shape[1]
    g_rot = np.zeros_like(local_rot)
    g_pos = np.zeros((T, nb, 3), np.float32)

    def qmul(a, b):
        x1, y1, z1, w1 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
        x2, y2, z2, w2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
        return np.stack([
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2], -1)

    def qrot(q, v):
        xyz, w = q[..., :3], q[..., 3:4]
        t = 2.0 * np.cross(xyz, v)
        return v + w * t + np.cross(xyz, t)

    for b in range(nb):
        p = parents[b]
        if p < 0:
            g_rot[:, b] = local_rot[:, b]
            g_pos[:, b] = root_pos
        else:
            g_rot[:, b] = qmul(g_rot[:, p], local_rot[:, b])
            g_pos[:, b] = g_pos[:, p] + qrot(g_rot[:, p],
                                             np.broadcast_to(local_t[b], (T, 3)))
    return g_pos, g_rot


class MotionData(NamedTuple):
    """Uniform-dt resampled motion bank (padded over motions)."""

    root_pos: jax.Array       # (M, T, 3)
    root_rot: jax.Array       # (M, T, 4)
    root_vel: jax.Array       # (M, T, 3)
    root_ang_vel: jax.Array   # (M, T, 3)
    dof_pos: jax.Array        # (M, T, 28)
    dof_vel: jax.Array        # (M, T, 28)
    key_pos: jax.Array        # (M, T, 4, 3)
    length_s: jax.Array       # (M,)
    num_frames: jax.Array     # (M,) int32
    weights: jax.Array        # (M,) sampling weights (normalized)


class MotionLib:
    def __init__(self, motion_files, dt: float, weights=None):
        """``motion_files``: list of .npy paths or (path, weight) pairs."""
        if isinstance(motion_files, str):
            motion_files = [motion_files]
        files, ws = [], []
        for m in motion_files:
            if isinstance(m, (tuple, list)):
                files.append(m[0]); ws.append(float(m[1]))
            else:
                files.append(m); ws.append(1.0)
        if weights is not None:
            ws = list(weights)
        self.dt = float(dt)
        banks = [self._load(f) for f in files]
        T_max = max(b["root_pos"].shape[0] for b in banks)

        def pad(key):
            out = []
            for b in banks:
                a = b[key]
                reps = [(0, T_max - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
                out.append(np.pad(a, reps, mode="edge"))
            return jnp.asarray(np.stack(out), jnp.float32)

        w = np.asarray(ws, np.float64)
        self.data = MotionData(
            root_pos=pad("root_pos"), root_rot=pad("root_rot"),
            root_vel=pad("root_vel"), root_ang_vel=pad("root_ang_vel"),
            dof_pos=pad("dof_pos"), dof_vel=pad("dof_vel"),
            key_pos=pad("key_pos"),
            length_s=jnp.asarray([(b["root_pos"].shape[0] - 1) * self.dt
                                  for b in banks], jnp.float32),
            num_frames=jnp.asarray([b["root_pos"].shape[0] for b in banks],
                                   jnp.int32),
            weights=jnp.asarray(w / w.sum(), jnp.float32),
        )
        self.num_motions = len(banks)

    # -- loading ---------------------------------------------------------
    def _load(self, path: str) -> dict:
        raw = np.load(path, allow_pickle=True).item()
        fps = float(np.asarray(raw["fps"]))
        rot = raw["rotation"]["arr"].astype(np.float32)        # (T, 15, 4)
        root_pos = raw["root_translation"]["arr"].astype(np.float32)
        gvel = raw["global_velocity"]["arr"].astype(np.float32)
        gavel = raw["global_angular_velocity"]["arr"].astype(np.float32)
        tree = raw["skeleton_tree"]
        parents = np.asarray(tree["parent_indices"]["arr"])
        local_t = np.asarray(tree["local_translation"]["arr"], np.float32)
        names = list(tree["node_names"])
        key_ids = [names.index(n) for n in KEY_BODY_NAMES]

        T = rot.shape[0]
        src_dt = 1.0 / fps
        # local rotations -> 28 dof coordinates (motion_lib.py:221-248)
        dof_pos = np.zeros((T, NUM_DOF), np.float32)
        for j, b in enumerate(DOF_BODY_IDS):
            off = DOF_OFFSETS[j]
            size = DOF_OFFSETS[j + 1] - off
            q = rot[:, b]
            if size == 3:
                dof_pos[:, off: off + 3] = _quat_to_exp_np(q)
            else:
                exp = _quat_to_exp_np(q)
                dof_pos[:, off] = exp[:, _1DOF_AXIS.get(b, 1)]
        dof_vel = np.zeros_like(dof_pos)
        dof_vel[:-1] = (dof_pos[1:] - dof_pos[:-1]) * fps
        dof_vel[-1] = dof_vel[-2] if T > 1 else 0.0

        g_pos, _ = _fk_positions(parents, local_t, root_pos, rot)
        key_pos = g_pos[:, key_ids]

        bank = dict(root_pos=root_pos, root_rot=rot[:, 0], root_vel=gvel[:, 0],
                    root_ang_vel=gavel[:, 0], dof_pos=dof_pos, dof_vel=dof_vel,
                    key_pos=key_pos)
        # resample from src fps grid to the control-dt grid
        length = (T - 1) * src_dt
        n_out = max(int(length / self.dt) + 1, 2)
        t_out = np.arange(n_out) * self.dt
        idx = np.minimum((t_out / src_dt).astype(int), T - 2)
        frac = (t_out / src_dt - idx)[:, None].astype(np.float32)

        def lerp(a):
            flat = a.reshape(T, -1)
            out = flat[idx] * (1 - frac) + flat[idx + 1] * frac
            return out.reshape((n_out,) + a.shape[1:])

        out = {k: lerp(v) for k, v in bank.items() if k != "root_rot"}
        # slerp root rotation
        q0, q1 = bank["root_rot"][idx], bank["root_rot"][idx + 1]
        out["root_rot"] = np.asarray(
            maths.slerp(jnp.asarray(q0), jnp.asarray(q1), jnp.asarray(frac)))
        return out

    # -- runtime sampling (jit-safe) --------------------------------------
    def sample_motions(self, key, n):
        """Weighted motion sampling (motion_lib.py:61-65)."""
        return jax.random.categorical(
            key, jnp.log(self.data.weights)[None].repeat(n, 0))

    def sample_time(self, key, motion_ids, truncate_t: float = 0.0):
        """(motion_lib.py:67-81)."""
        lens = self.data.length_s[motion_ids] - truncate_t
        u = jax.random.uniform(key, motion_ids.shape)
        return u * jnp.maximum(lens, 0.0)

    def get_motion_state(self, motion_ids, motion_times):
        """Batched state fetch with uniform-grid lerp (motion_lib.py:83-153)."""
        d = self.data
        f = motion_times / self.dt
        n = d.num_frames[motion_ids]
        i0 = jnp.clip(jnp.floor(f).astype(jnp.int32), 0, n - 2)
        i1 = i0 + 1
        t = jnp.clip(f - i0, 0.0, 1.0)[:, None]

        def fetch(arr, i):
            return arr[motion_ids, i]

        def lerp(arr):
            a0 = fetch(arr, i0)
            a1 = fetch(arr, i1)
            tt = t.reshape(t.shape + (1,) * (a0.ndim - 2))
            return a0 * (1 - tt) + a1 * tt

        root_rot = maths.slerp(fetch(d.root_rot, i0), fetch(d.root_rot, i1), t)
        return dict(
            root_pos=lerp(d.root_pos), root_rot=root_rot,
            root_vel=lerp(d.root_vel), root_ang_vel=lerp(d.root_ang_vel),
            dof_pos=lerp(d.dof_pos), dof_vel=lerp(d.dof_vel),
            key_pos=lerp(d.key_pos),
        )

    def sample_state_pairs(self, key, n, pair_dt: float):
        """Sample (s_{t-dt}, s_t) transition pairs for AMP demos
        (humanoid_amp.py:105-134 fetch_amp_obs_demo)."""
        k1, k2 = jax.random.split(key)
        ids = self.sample_motions(k1, n)
        t1 = self.sample_time(k2, ids, truncate_t=pair_dt) + pair_dt
        s1 = self.get_motion_state(ids, t1)
        s0 = self.get_motion_state(ids, t1 - pair_dt)
        return s0, s1
