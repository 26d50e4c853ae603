"""Batch-lane fused dynamics chain (TPU Pallas).

The articulation-dynamics chain (world spatial inertia -> CRBA mass matrix ->
RNEA bias force -> H = M + diag -> H^-1 -> qdd) works on per-env matrices that
are *tiny* — (6, 6) inertia blocks, (nv, nv) mass matrices with nv <= ~40.
In the default XLA layout those trailing dims are padded to (8, 128) vector
tiles, so a (4096, 9, 6, 6) inertia stack occupies ~151 MB of HBM for 5.3 MB
of payload; the chain was ~1.8 ms of the ~2.7 ms Ant step.

This module computes the whole chain with the env batch riding the 128-lane
minor dimension instead: every array is laid out ``(..., B)`` and every
operation is an elementwise VPU op over the lanes — tiny body/dof axes live
in sublanes or unrolled Python loops over the *static* kinematic tree.  One
Pallas kernel per substep does a single HBM round trip at payload size.

Numerically this is *stronger* than the XLA path: all products are true f32
FMAs (the dot_general chain ran at HIGH precision = 3-pass bf16).  The same
functions run unfused on any backend (plain jnp on batch-last arrays), which
is how CPU tests pin parity against the reference-layout implementation.

Reference parity notes: the chain replaces the articulation-inertia work
PhysX does inside ``gym.simulate`` (vec_task.py:381-384); like PhysX, the
engine can evaluate it once per control step and reuse it across substeps
(SimParams.reuse_mass_matrix).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# static tree plan


class DynPlan:
    """Static (numpy, compile-time) model constants for the batch-last chain.

    Built once per PhysicsEngine; every mask/tree quantity is baked into the
    kernel as constants, so the only runtime inputs are the per-env arrays.
    """

    def __init__(self, engine):
        self.nb = int(engine.nb)
        self.nv = int(engine.nv)
        self.parent = np.asarray(engine.parent, np.int64)
        # children-before-parents order for subtree (bottom-up) sums; the
        # builder appends bodies in traversal order so parent[b] < b, but we
        # derive the order defensively instead of assuming it.
        order = sorted(range(self.nb),
                       key=lambda b: -self._depth(b))
        self.bottom_up = order
        self.mass = np.asarray(engine.mass, np.float32)          # (nb,)
        self.com = np.asarray(engine.com, np.float32)            # (nb, 3)
        self.inertia = np.asarray(engine.inertia, np.float32)    # (nb, 3, 3)
        self.gravity = np.asarray(engine.gravity, np.float32)    # (3,)
        self.grav_mask = np.asarray(engine.grav_mask, np.float32)  # (nb,)
        self.dof_body = np.asarray(engine.dof_body, np.int64)    # (nv,)
        self.body_dofs = [
            [int(v) for v in range(self.nv) if self.dof_body[v] == b]
            for b in range(self.nb)
        ]
        # CRBA pair mask (strict-ancestor + same-body upper triangle), see
        # PhysicsEngine.__init__ — (nv, nv) bool, i indexes the ancestor dof.
        self.dof_anc = np.asarray(engine.dof_anc, bool)

    def consts(self):
        """Model-constant arrays the kernel needs at runtime.  Pallas kernels
        may not capture traced constants, so these ride along as (tiny,
        grid-invariant) inputs rather than closure captures."""
        a0 = np.concatenate(
            [np.zeros(3, np.float32), -self.gravity]).astype(np.float32)
        return {
            "inertia": self.inertia.astype(np.float32),          # (nb, 3, 3)
            "mass": self.mass.astype(np.float32)[:, None],       # (nb, 1)
            "com": self.com.astype(np.float32),                  # (nb, 3)
            "a0": a0[None, :] * self.grav_mask[:, None],         # (nb, 6)
            "anc": self.dof_anc.astype(np.float32),              # (nv, nv)
            "anc_t": self.dof_anc.T.astype(np.float32),          # (nv, nv)
        }

    def _depth(self, b):
        d = 0
        while self.parent[b] != -1:
            b = int(self.parent[b])
            d += 1
        return d


# ---------------------------------------------------------------------------
# batch-last math helpers (arrays are (..., B); components unrolled)


def _cross_bl(a, b):
    """Cross product of (..., 3, B) stacks along axis -2."""
    a0, a1, a2 = a[..., 0, :], a[..., 1, :], a[..., 2, :]
    b0, b1, b2 = b[..., 0, :], b[..., 1, :], b[..., 2, :]
    return jnp.stack(
        [a1 * b2 - a2 * b1, a2 * b0 - a0 * b2, a0 * b1 - a1 * b0], axis=-2)


def _cross_motion_bl(a, b):
    """Spatial motion cross product on (..., 6, B) [ang, lin] stacks."""
    aw, av = a[..., :3, :], a[..., 3:, :]
    bw, bv = b[..., :3, :], b[..., 3:, :]
    return jnp.concatenate(
        [_cross_bl(aw, bw), _cross_bl(aw, bv) + _cross_bl(av, bw)], axis=-2)


def _cross_force_bl(v, f):
    """Spatial force cross product v x* f on (..., 6, B) stacks."""
    w, vl = v[..., :3, :], v[..., 3:, :]
    n, fl = f[..., :3, :], f[..., 3:, :]
    return jnp.concatenate(
        [_cross_bl(w, n) + _cross_bl(vl, fl), _cross_bl(w, fl)], axis=-2)


def _quat_rotmat_bl(q):
    """(nb, 4, B) xyzw quaternions -> (nb, 3, 3, B) rotation matrices."""
    x, y, z, w = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    one = jnp.ones_like(x)
    rows = [
        [one - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)],
        [2 * (xy + wz), one - 2 * (xx + zz), 2 * (yz - wx)],
        [2 * (xz - wy), 2 * (yz + wx), one - 2 * (xx + yy)],
    ]
    return jnp.stack([jnp.stack(r, axis=1) for r in rows], axis=1)


def _mm3_bl(A, B):
    """(..., 3, 3, B) @ (..., 3, 3, B) with a size-3 contraction."""
    return (A[..., :, 0:1, :] * B[..., 0:1, :, :]
            + A[..., :, 1:2, :] * B[..., 1:2, :, :]
            + A[..., :, 2:3, :] * B[..., 2:3, :, :])


def _mm3_nt_bl(A, B):
    """A @ B^T on (..., 3, 3, B) stacks — transpose-free (Mosaic lowers
    neither non-lane-axis transposes nor the gathers that mixed
    newaxis+integer indexing produces)."""
    # C[i, j] = sum_k A[i, k] * B[j, k]
    Aexp = A[..., :, None, :, :]                    # (.., 3, 1, 3, B)
    Bexp = B[..., None, :, :, :]                    # (.., 1, 3, 3, B)
    return jnp.sum(Aexp * Bexp, axis=-2)


def _matvec_bl(A, x):
    """(..., m, n, B) @ (..., n, B) -> (..., m, B)."""
    return jnp.sum(A * x[..., None, :, :], axis=-2)


def _skew_bl(v):
    """(..., 3, B) -> (..., 3, 3, B) skew matrices."""
    z = jnp.zeros_like(v[..., 0, :])
    v0, v1, v2 = v[..., 0, :], v[..., 1, :], v[..., 2, :]
    return jnp.stack([
        jnp.stack([z, -v2, v1], axis=-2),
        jnp.stack([v2, z, -v0], axis=-2),
        jnp.stack([-v1, v0, z], axis=-2),
    ], axis=-3)


def _eye_bl(n, dtype):
    """(n, n, 1) identity built in-kernel (iota avoids constant capture)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
    return (i == j).astype(dtype)


def _subtree_sum(plan: DynPlan, per_body):
    """Bottom-up subtree sums of a list of per-body arrays."""
    acc = list(per_body)
    for b in plan.bottom_up:
        p = int(plan.parent[b])
        if p >= 0:
            acc[p] = acc[p] + acc[b]
    return acc


def _path_sum(plan: DynPlan, per_body):
    """Top-down root-to-body path sums of a list of per-body arrays."""
    acc = list(per_body)
    for b in reversed(plan.bottom_up):          # parents before children
        p = int(plan.parent[b])
        if p >= 0:
            acc[b] = acc[b] + acc[p]
    return acc


# ---------------------------------------------------------------------------
# chain pieces


def spatial_inertia_bl(plan: DynPlan, consts, body_x, body_q,
                       mass_scale=None, shape_scale=None):
    """World spatial inertia about the origin: (nb, 6, 6, B) batch-last.

    Mirrors PhysicsEngine.spatial_inertia exactly (incl. the uniform-density
    second-moment transform for per-env anisotropic shape scales)."""
    B = body_x.shape[-1]
    f = body_x.dtype
    R = _quat_rotmat_bl(body_q)                                # (nb, 3, 3, B)
    I_loc = jnp.broadcast_to(
        consts["inertia"][..., None], (plan.nb, 3, 3, B)).astype(f)
    m = jnp.broadcast_to(consts["mass"], (plan.nb, B)).astype(f)  # (nb, B)
    com = jnp.broadcast_to(
        consts["com"][..., None], (plan.nb, 3, B)).astype(f)
    eye3 = _eye_bl(3, f)[None]                                 # (1, 3, 3, 1)
    if shape_scale is not None:                                # (nb, 3, B)
        s = shape_scale.astype(f)
        svol = (s[:, 0] * s[:, 1] * s[:, 2])[:, None, None, :]  # (nb,1,1,B)
        tr = (I_loc[:, 0, 0] + I_loc[:, 1, 1] + I_loc[:, 2, 2])[:, None, None, :]
        Cm = 0.5 * tr * eye3 - I_loc
        Cm = svol * (s[:, :, None, :] * Cm * s[:, None, :, :])
        trc = (Cm[:, 0, 0] + Cm[:, 1, 1] + Cm[:, 2, 2])[:, None, None, :]
        I_loc = trc * eye3 - Cm
        m = m * svol[:, 0, 0, :]
        com = com * s
    Ic = _mm3_nt_bl(_mm3_bl(R, I_loc), R)
    c = body_x + _matvec_bl(R, com)                            # world com
    if mass_scale is not None:                                 # (nb, B)
        m = m * mass_scale
        Ic = Ic * mass_scale[:, None, None, :]
    cx = _skew_bl(c)
    m4 = m[:, None, None, :]
    mcx = m4 * cx
    top_left = Ic - m4 * _mm3_bl(cx, cx)
    I_O = jnp.concatenate([
        jnp.concatenate([top_left, mcx], axis=2),
        jnp.concatenate([-mcx, m4 * jnp.broadcast_to(eye3, cx.shape)],
                        axis=2),
    ], axis=1)                                                 # (nb, 6, 6, B)
    return I_O


def mass_matrix_bl(plan: DynPlan, consts, S, I_O):
    """CRBA on batch-last arrays: S (nv, 6, B), I_O (nb, 6, 6, B) -> (nv,nv,B).

    Same composite/mask structure as PhysicsEngine.mass_matrix: the composite
    inertia is the subtree sum at the *descendant* dof's body, the pair mask
    counts each (ancestor, descendant) pair once."""
    Icomp = _subtree_sum(plan, [I_O[b] for b in range(plan.nb)])
    F = jnp.stack(
        [_matvec_bl(Icomp[int(plan.dof_body[v])], S[v])
         for v in range(plan.nv)], axis=0)                     # (nv, 6, B)
    # G[i, j] = S_i . F_j, accumulated over the 6 spatial components; the
    # symmetrized lower half is built from G^T = F-outer-S directly rather
    # than a (non-lane-axis) transpose, which Mosaic does not lower.
    G = sum(S[:, k, :][:, None, :] * F[:, k, :][None, :, :]
            for k in range(6))
    Gt = sum(F[:, k, :][:, None, :] * S[:, k, :][None, :, :]
             for k in range(6))
    upper = G * consts["anc"][:, :, None].astype(S.dtype)
    lower = Gt * consts["anc_t"][:, :, None].astype(S.dtype)
    eye = _eye_bl(plan.nv, S.dtype)
    diag = jnp.sum(upper * eye, axis=1, keepdims=True)         # (nv, 1, B)
    return upper + lower - eye * diag


def body_velocities_bl(plan: DynPlan, S, qd):
    """Per-body spatial velocity (list of (6, B)) via root-to-body path sums."""
    Sqd = S * qd[:, None, :]                                   # (nv, 6, B)
    zero = jnp.zeros_like(S[0])
    own = [
        sum((Sqd[v] for v in plan.body_dofs[b]), zero)
        for b in range(plan.nb)
    ]
    return _path_sum(plan, own), Sqd


def bias_force_bl(plan: DynPlan, consts, S, qd, I_O, V_body=None, Sqd=None,
                  fg=None):
    """RNEA bias force C (nv, B); mirrors PhysicsEngine.bias_force.

    ``fg``: fresh per-body gravity wrench (nb, 6, B) — passed on the cached
    (mass-matrix-reuse) path, where gravity through the STALE I_O's a0 trick
    would torque every translating floating base by |g|*h*v per substep."""
    if V_body is None:
        V_body, Sqd = body_velocities_bl(plan, S, qd)
    f = S.dtype
    a0 = consts["a0"][..., None].astype(f)                     # (nb, 6, 1)
    xi_dof = [
        _cross_motion_bl(V_body[int(plan.dof_body[v])], Sqd[v])
        for v in range(plan.nv)
    ]
    zero = jnp.zeros_like(S[0])
    xi_body = [
        sum((xi_dof[v] for v in plan.body_dofs[b]), zero)
        for b in range(plan.nb)
    ]
    a_cum = _path_sum(plan, xi_body)
    fb = []
    for b in range(plan.nb):
        a_b = (a_cum[b] if fg is not None else a0[b] + a_cum[b])
        Iv = _matvec_bl(I_O[b], V_body[b])
        f_b = _matvec_bl(I_O[b], a_b) + _cross_force_bl(V_body[b], Iv)
        if fg is not None:
            f_b = f_b + fg[b]
        fb.append(f_b)
    f_comp = _subtree_sum(plan, fb)
    C = jnp.stack(
        [jnp.sum(S[v] * f_comp[int(plan.dof_body[v])], axis=0)
         for v in range(plan.nv)], axis=0)                     # (nv, B)
    return C


def sweep_inverse_bl(M):
    """Gauss-Jordan sweep inverse on (n, n, B) — shared with engine."""
    from .engine import _sweep_inverse_batchlast
    return _sweep_inverse_batchlast(M)


# ---------------------------------------------------------------------------
# fused chains


def dyn_full_bl(plan: DynPlan, consts, body_x, body_q, S, qd, rhs, diag,
                mass_scale=None, shape_scale=None):
    """Full chain: inputs batch-last, returns (qdd, Hinv, I_O) batch-last.

    rhs is the generalized force *without* the bias term (tau + drives +
    springs + external wrenches); diag is the implicit-drive diagonal."""
    I_O = spatial_inertia_bl(plan, consts, body_x, body_q,
                             mass_scale, shape_scale)
    M = mass_matrix_bl(plan, consts, S, I_O)
    H = M + _eye_bl(plan.nv, S.dtype) * diag[:, None, :]
    Hinv = sweep_inverse_bl(H)
    C = bias_force_bl(plan, consts, S, qd, I_O)
    qdd = _matvec_bl(Hinv, rhs - C)
    return qdd, Hinv, I_O


def dyn_cached_bl(plan: DynPlan, consts, S, qd, rhs, I_O, Hinv, fg):
    """Cached chain: reuse (I_O, Hinv) from an earlier substep; the
    velocity-dependent bias force refreshes, and gravity comes through the
    FRESH wrench ``fg`` rather than the stale I_O
    (SimParams.reuse_mass_matrix)."""
    C = bias_force_bl(plan, consts, S, qd, I_O, fg=fg)
    return _matvec_bl(Hinv, rhs - C)


# ---------------------------------------------------------------------------
# Pallas wrappers


def _pick_block(N: int, vmem_elems_per_lane: int) -> Optional[int]:
    """Largest lane block dividing N under a ~6 MB VMEM working-set budget."""
    budget = 6 * 1024 * 1024 // 4
    for cand in (1024, 512, 256, 128):
        if N % cand == 0 and vmem_elems_per_lane * cand <= budget:
            return cand
    return None


def _vmem_per_lane(plan: DynPlan) -> int:
    # dominant live arrays per lane: I_O + composites (2 * nb * 48 padded),
    # rotation/work (nb * 64), M/H/Hinv sweeps (3 * nv * pad8(nv)), S/F rows
    pad8 = lambda n: (n + 7) // 8 * 8
    return (plan.nb * 48 * 2 + plan.nb * 64
            + 3 * plan.nv * pad8(plan.nv) + 4 * plan.nv * 8)


# test hook: run the Pallas kernels in interpret mode on non-TPU backends so
# CPU tests exercise the exact kernel code path (grid/BlockSpec plumbing
# included) against the reference-layout implementation
_FORCE_INTERPRET = False


def supports(engine, N: int, dtype) -> bool:
    """Kernel path applies: TPU backend, f32, lane-divisible batch."""
    if dtype != jnp.float32:
        return False
    if jax.default_backend() != "tpu" and not _FORCE_INTERPRET:
        return False
    plan = get_plan(engine)
    return _pick_block(N, _vmem_per_lane(plan)) is not None


def get_plan(engine) -> DynPlan:
    """Per-engine kernel plan, stored ON the engine.  (A global dict keyed
    by id(engine) handed recycled ids a stale plan once the old engine was
    garbage-collected — any process building several tasks, e.g. the bench
    suite or PBT exec-restarts, could crash on a shape mismatch or, worse,
    silently run another model's plan.)"""
    plan = getattr(engine, "_dyn_plan", None)
    if plan is None:
        plan = DynPlan(engine)
        engine._dyn_plan = plan
    return plan


def _bl(x, src_batch_axis=0):
    """Move the env batch axis to the minor (lane) position."""
    perm = [a for a in range(x.ndim) if a != src_batch_axis] + [src_batch_axis]
    return jnp.transpose(x, perm)


def dyn_forward_pallas(engine, body_x, body_q, S, qd, rhs, diag,
                       mass_scale=None, shape_scale=None):
    """Fused full-chain kernel.  Standard-layout inputs; returns
    (qdd (N, nv), Hinv (N, nv, nv), cache) where cache keeps the batch-last
    (I_O, Hinv) for the cross-substep reuse path."""
    from jax.experimental import pallas as pl

    plan = get_plan(engine)
    N = qd.shape[0]
    nb, nv = plan.nb, plan.nv
    block = _pick_block(N, _vmem_per_lane(plan))
    has_ms = mass_scale is not None
    has_ss = shape_scale is not None
    const_np = plan.consts()
    const_keys = sorted(const_np)

    def kernel(*refs):
        i = len(const_keys)
        consts = {k: refs[j][...] for j, k in enumerate(const_keys)}
        bx = refs[i][...]; i += 1
        bq = refs[i][...]; i += 1
        S_ = refs[i][...]; i += 1
        qd_ = refs[i][...]; i += 1
        rhs_ = refs[i][...]; i += 1
        dg = refs[i][...]; i += 1
        ms = None
        ss = None
        if has_ms:
            ms = refs[i][...]; i += 1
        if has_ss:
            ss = refs[i][...]; i += 1
        qdd_ref, hinv_ref, io_ref = refs[i], refs[i + 1], refs[i + 2]
        qdd, Hinv, I_O = dyn_full_bl(plan, consts, bx, bq, S_, qd_, rhs_, dg,
                                     ms, ss)
        qdd_ref[...] = qdd
        hinv_ref[...] = Hinv
        io_ref[...] = I_O

    lane = lambda *lead: pl.BlockSpec(
        lead + (block,), lambda i: (0,) * len(lead) + (i,))
    whole = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    inputs = [jnp.asarray(const_np[k]) for k in const_keys]
    in_specs = [whole(const_np[k].shape) for k in const_keys]
    inputs += [
        _bl(body_x), _bl(body_q), _bl(S), _bl(qd), _bl(rhs), _bl(diag)]
    in_specs += [lane(nb, 3), lane(nb, 4), lane(nv, 6), lane(nv), lane(nv),
                 lane(nv)]
    if has_ms:
        ms_full = jnp.broadcast_to(mass_scale, (N, nb))
        inputs.append(_bl(ms_full))
        in_specs.append(lane(nb))
    if has_ss:
        inputs.append(_bl(shape_scale))
        in_specs.append(lane(nb, 3))
    qdd_bl, hinv_bl, io_bl = pl.pallas_call(
        kernel,
        grid=(N // block,),
        in_specs=in_specs,
        out_specs=[lane(nv), lane(nv, nv), lane(nb, 6, 6)],
        out_shape=[
            jax.ShapeDtypeStruct((nv, N), qd.dtype),
            jax.ShapeDtypeStruct((nv, nv, N), qd.dtype),
            jax.ShapeDtypeStruct((nb, 6, 6, N), qd.dtype),
        ],
        interpret=_FORCE_INTERPRET,
    )(*inputs)
    qdd = jnp.transpose(qdd_bl, (1, 0))
    Hinv = jnp.transpose(hinv_bl, (2, 0, 1))
    return qdd, Hinv, ("bl", io_bl, hinv_bl, Hinv)


def dyn_cached_pallas(engine, S, qd, rhs, cache, f_grav):
    """Fused cached-chain kernel: bias refresh + qdd against cached
    (I_O, Hinv) kept batch-last from dyn_forward_pallas.  ``f_grav`` is the
    fresh (N, nb, 6) gravity wrench (engine.gravity_wrench) — gravity may
    not ride the cached I_O (stale-com torque; see bias_force_bl)."""
    from jax.experimental import pallas as pl

    plan = get_plan(engine)
    _, io_bl, hinv_bl, _ = cache
    N = qd.shape[0]
    nb, nv = plan.nb, plan.nv
    block = _pick_block(N, _vmem_per_lane(plan))
    const_np = plan.consts()
    const_keys = sorted(const_np)

    def kernel(*refs):
        consts = {k: refs[j][...] for j, k in enumerate(const_keys)}
        i = len(const_keys)
        (S_ref, qd_ref, rhs_ref, io_ref, hinv_ref, fg_ref,
         out_ref) = refs[i: i + 7]
        out_ref[...] = dyn_cached_bl(
            plan, consts, S_ref[...], qd_ref[...], rhs_ref[...], io_ref[...],
            hinv_ref[...], fg_ref[...])

    lane = lambda *lead: pl.BlockSpec(
        lead + (block,), lambda i: (0,) * len(lead) + (i,))
    whole = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    qdd_bl = pl.pallas_call(
        kernel,
        grid=(N // block,),
        in_specs=[whole(const_np[k].shape) for k in const_keys]
        + [lane(nv, 6), lane(nv), lane(nv), lane(nb, 6, 6), lane(nv, nv),
           lane(nb, 6)],
        out_specs=lane(nv),
        out_shape=jax.ShapeDtypeStruct((nv, N), qd.dtype),
        interpret=_FORCE_INTERPRET,
    )(*([jnp.asarray(const_np[k]) for k in const_keys]
        + [_bl(S), _bl(qd), _bl(rhs), io_bl, hinv_bl, _bl(f_grav)]))
    return jnp.transpose(qdd_bl, (1, 0))


# ---------------------------------------------------------------------------
# Fused FK + motion-subspace kernel.
#
# engine.fk / engine.dof_motion are Python-unrolled chains of tiny
# elementwise ops over bodies; XLA cannot fuse across the parent-chain
# dependencies, so every substep paid ~nb kernel launches + HBM round trips
# (measured 2.5 ms of a 6.1 ms HumanoidAMP substep at 4096 envs — 40%).
# Here the whole chain runs in ONE Pallas launch: envs ride the 128-lane
# minor axis, bodies unroll in registers, and all per-body constants
# (joint types/axes/anchors/offsets) are baked in as Python statics.
# Numerics: identical formulas; quat_from_angle_axis skips the redundant
# final renormalization (unit axis * exact sin/cos).

def _qmul_cf(a, b):
    """Hamilton product, xyzw, components-first layout (4, B)."""
    ax, ay, az, aw = a[0], a[1], a[2], a[3]
    bx, by, bz, bw = b[0], b[1], b[2], b[3]
    return jnp.stack([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz])


def _qapply_cf(q, v):
    """Rotate (3, B) vectors by (4, B) quats: v + 2*(w*t + xyz x t)/2."""
    qx, qy, qz, qw = q[0], q[1], q[2], q[3]
    vx, vy, vz = v[0], v[1], v[2]
    tx = 2.0 * (qy * vz - qz * vy)
    ty = 2.0 * (qz * vx - qx * vz)
    tz = 2.0 * (qx * vy - qy * vx)
    return jnp.stack([
        vx + qw * tx + qy * tz - qz * ty,
        vy + qw * ty + qz * tx - qx * tz,
        vz + qw * tz + qx * ty - qy * tx])


def _cross_cf(a, b):
    return jnp.stack([
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0]])


def _fk_motion_bl(engine, plan, qv):
    """FK + S on batch-last (nq, B) coords -> ((nb,3,B), (nb,4,B),
    (nv,6,B)).  Shared by the Pallas kernel and interpret-mode tests."""
    import isaacgymenvs_ma_tpu.models.model as md_

    B = qv.shape[-1]
    dt = qv.dtype
    # build per-body constant vectors from SCALAR constants (pallas kernels
    # may not capture constant ARRAYS; scalar broadcasts are fine)
    cst = lambda v: jnp.stack(
        [jnp.full((B,), float(x), dt) for x in np.asarray(v, np.float32)])
    xs, qs = [], []
    cols = []
    zero3 = jnp.zeros((3, B), dt)
    for b in range(plan.nb):
        t = int(engine.jnt_type_np[b])
        qa = int(engine.q_adr[b])
        if engine.parent[b] == -1:
            xp = zero3
            qp = cst([0.0, 0, 0, 1.0])
        else:
            xp, qp = xs[int(engine.parent[b])], qs[int(engine.parent[b])]
        m_ = engine.model
        bp = np.asarray(m_.body_pos[b], np.float32)
        bq = np.asarray(m_.body_quat[b], np.float32)
        axis = np.asarray(m_.jnt_axis[b], np.float32)
        nrm = np.linalg.norm(axis)
        axis_n = axis / nrm if nrm > 0 else axis
        anchor = np.asarray(m_.jnt_pos[b], np.float32)
        if t == md_.FREE:
            xb = qv[qa: qa + 3]
            qb = qv[qa + 3: qa + 7]
        elif t in (md_.HINGE, md_.SCREW):
            half = 0.5 * qv[qa]
            s, c = jnp.sin(half), jnp.cos(half)
            qj = jnp.stack([axis_n[0] * s, axis_n[1] * s, axis_n[2] * s, c])
            ql = _qmul_cf(cst(bq), qj)
            tl = cst(bp + _np_qapply(bq, anchor)) - _qapply_cf(ql, cst(anchor))
            if t == md_.SCREW:
                pitch = float(engine.jnt_pitch_np[b]) / (2.0 * np.pi)
                aw_b = _np_qapply(bq, axis_n)
                tl = tl + cst(aw_b) * (pitch * qv[qa])[None]
            xb = xp + _qapply_cf(qp, tl)
            qb = _qmul_cf(qp, ql)
        elif t == md_.SLIDE:
            aw_b = _np_qapply(bq, axis_n)
            tl = cst(bp) + cst(aw_b) * qv[qa][None]
            xb = xp + _qapply_cf(qp, tl)
            qb = _qmul_cf(qp, cst(bq))
        else:  # FIXED
            xb = xp + _qapply_cf(qp, cst(bp))
            qb = _qmul_cf(qp, cst(bq))
        xs.append(xb)
        qs.append(qb)
        # motion-subspace columns (about the world origin, [ang; lin])
        if t == md_.FREE:
            e = np.eye(3, dtype=np.float32)
            for i in range(3):
                cols.append(jnp.concatenate([zero3, cst(e[i])]))
            for i in range(3):
                ei = cst(e[i])
                cols.append(jnp.concatenate([ei, _cross_cf(xb, ei)]))
        elif t in (md_.HINGE, md_.SCREW, md_.SLIDE):
            a_w = _qapply_cf(qb, cst(axis_n))
            if t == md_.SLIDE:
                cols.append(jnp.concatenate([zero3, a_w]))
            else:
                anch_w = xb + _qapply_cf(qb, cst(anchor))
                lin = _cross_cf(anch_w, a_w)
                if t == md_.SCREW:
                    pitch = float(engine.jnt_pitch_np[b]) / (2.0 * np.pi)
                    lin = lin + pitch * a_w
                cols.append(jnp.concatenate([a_w, lin]))
    bx = jnp.stack(xs)                        # (nb, 3, B)
    bq_ = jnp.stack(qs)                       # (nb, 4, B)
    S = jnp.stack(cols).reshape(len(cols), 2, 3, B).reshape(len(cols), 6, B)
    return bx, bq_, S


def _np_qapply(q, v):
    """numpy xyzw quat rotate (build-time constants)."""
    q = np.asarray(q, np.float32)
    v = np.asarray(v, np.float32)
    t = 2.0 * np.cross(q[:3], v)
    return v + q[3] * t + np.cross(q[:3], t)


def fk_supports(engine, N, dtype) -> bool:
    if dtype != jnp.float32:
        return False
    if jax.default_backend() != "tpu" and not _FORCE_INTERPRET:
        return False
    plan = get_plan(engine)
    per_lane = engine.nq + plan.nb * 7 + plan.nv * 6 + 64
    return _pick_block(N, per_lane) is not None


def fk_motion_pallas(engine, q):
    """(body_x (N,nb,3), body_q (N,nb,4), S (N,nv,6)) in one launch."""
    from jax.experimental import pallas as pl

    plan = get_plan(engine)
    N = q.shape[0]
    nb, nv = plan.nb, plan.nv
    nq = q.shape[-1]
    per_lane = nq + nb * 7 + nv * 6 + 64
    block = _pick_block(N, per_lane)

    def kernel(q_ref, bx_ref, bq_ref, s_ref):
        bx, bq_, S = _fk_motion_bl(engine, plan, q_ref[...])
        bx_ref[...] = bx
        bq_ref[...] = bq_
        s_ref[...] = S

    lane = lambda *lead: pl.BlockSpec(
        lead + (block,), lambda i: (0,) * len(lead) + (i,))
    bx_bl, bq_bl, s_bl = pl.pallas_call(
        kernel,
        grid=(N // block,),
        in_specs=[lane(nq)],
        out_specs=[lane(nb, 3), lane(nb, 4), lane(nv, 6)],
        out_shape=[
            jax.ShapeDtypeStruct((nb, 3, N), q.dtype),
            jax.ShapeDtypeStruct((nb, 4, N), q.dtype),
            jax.ShapeDtypeStruct((nv, 6, N), q.dtype),
        ],
        interpret=_FORCE_INTERPRET,
    )(_bl(q))
    return (jnp.transpose(bx_bl, (2, 0, 1)),
            jnp.transpose(bq_bl, (2, 0, 1)),
            jnp.transpose(s_bl, (2, 0, 1)))
