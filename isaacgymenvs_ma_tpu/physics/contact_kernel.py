"""Batch-lane contact/constraint iteration kernel (TPU Pallas).

The projected-Jacobi impulse solve (engine._contact_solve) runs a scan of
``num_iterations`` (default 8) over row matvecs: each iteration re-reads the
row Jacobians J (N, P, nv, 3) and H^-1 J from HBM (~17 MB each on Ant @ 4096
envs), making the iteration loop the dominant HBM cost of a substep (~480 us
of a ~1 ms step, measured).

Split of labor with XLA (this is what made it a win — the first fully-fused
attempt lost 3.6x by moving the matmul-shaped H^-1 J / Delassus products from
the MXU onto broadcast-inflated VPU code):

- XLA (engine._contact_solve): narrowphase, row building, the batched
  H^-1 J GEMM and Delassus diagonal w = diag(J H^-1 J^T) — MXU work, done
  ONCE per solve.
- this kernel: the whole iteration loop.  J is rebuilt *inside* the kernel
  from the batch-last motion subspace S and contact points (J = S_lin +
  S_ang x p, masked by static ancestor/relative row masks, frame-projected)
  — ~1k FMAs/lane, far cheaper than streaming J through HBM.  The H^-1 J^T
  impulse application is deferred as qd += H^-1 (J^T dlam) (associativity;
  bit-identical math up to f32 rounding), so H^-1 (nv, nv) is the only
  quadratic object in VMEM and no HJ array exists at all.

Constraint groups and their update order match the XLA scan exactly:
grabs -> attractors -> contact rows (normal + friction box) -> joint limits,
Jacobi-with-relaxation within a group (PhysX TGS-iteration analog,
cfg/task/Ant.yaml:58 num_position_iterations).

Mosaic layout rules this file is written around (found the hard way):
- component axes must stay LEADING: slicing a sublane axis yields offset
  layouts, and vector.multi_reduction only lowers offset-free inputs;
- reductions over the sublane axis of derived (offset-carrying) arrays are
  done as unrolled slice-adds (_sum_ax1) or log-depth halving (_sum_lead);
- (K, nv) -> (K, nv, 1) is the one safe rank-increasing broadcast.

The same function runs unfused on CPU (plain jnp on batch-last arrays) for
parity tests; interpret=True covers the pallas_call plumbing.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .dyn_kernel import _eye_bl, _bl


def _row_jacobian(S, pts, mask):
    """J[c][k, v] = (S_lin[v, c] + (S_ang[v] x p[k])_c) * mask[k, v] —
    component-leading (3, K, nv, B).

    Mirrors engine._contact_point_jacobian / the pair/grab/attractor row
    construction (engine.py), batch-last."""
    a = [S_ang_i[None] for S_ang_i in
         (S[:, 0, :], S[:, 1, :], S[:, 2, :])]              # (1, nv, B) each
    lin = [S[:, 3 + i, :][None] for i in range(3)]
    b = [pts[i][:, None, :] for i in range(3)]              # (K, 1, B) each
    cross = [a[1] * b[2] - a[2] * b[1],
             a[2] * b[0] - a[0] * b[2],
             a[0] * b[1] - a[1] * b[0]]                     # (K, nv, B)
    m = mask[:, :, None]                                    # (K, nv, 1)
    return jnp.stack([(lin[c] + cross[c]) * m for c in range(3)], axis=0)


def _sum_ax1(x):
    """Sum over axis 1 of (K, n, B) by unrolled slice-adds (see header)."""
    return sum(x[:, v, :] for v in range(x.shape[1]))


def _sum_lead(x):
    """Sum over the leading axis by log-depth halving (leading-axis slices +
    adds only)."""
    while x.shape[0] > 1:
        k = x.shape[0]
        h = k // 2
        y = x[:h] + x[h:2 * h]
        if k % 2:
            y = jnp.concatenate([y, x[2 * h:]], axis=0)
        x = y
    return x[0]


def _rows_dot_qd(J, qd):
    """v[c][k] = sum_v J[c][k, v] qd[v] -> (3, K, B)."""
    q = qd[None, :, :]                                      # (1, nv, B)
    return jnp.stack([_sum_ax1(J[c] * q) for c in range(3)], axis=0)


def _rows_impulse(J, dlam):
    """imp[v] = sum_{k,c} dlam[c][k] J[c][k, v] -> (nv, B)."""
    acc = sum(J[c] * dlam[c][:, None, :] for c in range(3))
    return _sum_lead(acc)


def _hinv_matvec(Hinv, x):
    """(nv, nv, B) @ (nv, B) -> (nv, B) via unrolled sublane adds."""
    return _sum_ax1(Hinv * x[None, :, :])


def solve_bl(params, S, Hinv, qd, masks,
             pts_c, b_n, mu, active, frames, w_c,
             b_lo, b_hi, act_lo, act_hi,
             pts_a=None, b_a=None, w_a=None,
             pts_g=None, b_g=None, g_act=None, w_g=None):
    """Batch-last constraint iteration loop, component-leading row arrays.

    Dynamic per-row inputs are component-leading batch-last: pts_*/b_a/b_g/
    w_* (3, K, B), b_n/mu/active/g_act (K, B), qd/b_lo/... (nv, B).
    ``masks``: dict of static row masks {"c": (P, nv), "a": (A, nv),
    "g": (G, nv)}.  ``frames``: optional (3c, 3l, P, B) row frames (pair
    rows' tangent bases; identity on ground rows) — None when the scene has
    no body-pair contacts, in which case rows are world-aligned like the
    ground path.  ``w_*``: Delassus diagonals from the XLA GEMMs.
    Returns (qd (nv, B), lam (3, P, B), imp_dof (nv, B))."""
    relax = params.relaxation
    f = qd.dtype

    J = _row_jacobian(S, pts_c, masks["c"])                 # (3, P, nv, B)
    if frames is not None:
        # J <- frame-projected rows: Jf[l][k,v] = sum_c J[c][k,v] F[c,l][k]
        J = jnp.stack(
            [sum(J[c] * frames[c, l][:, None, :] for c in range(3))
             for l in range(3)], axis=0)
    if pts_g is not None:
        Jg = _row_jacobian(S, pts_g, masks["g"])
        lam_g = jnp.zeros(b_g.shape, f)
    if pts_a is not None:
        Ja = _row_jacobian(S, pts_a, masks["a"])
        lam_a = jnp.zeros(b_a.shape, f)

    eye = _eye_bl(Hinv.shape[0], f)
    hinv_diag = jnp.maximum(jnp.sum(Hinv * eye, axis=1), 1e-8)  # (nv, B)

    lam = jnp.zeros((3,) + b_n.shape, f)                    # (3, P, B)
    lam_lo = jnp.zeros_like(qd)
    lam_hi = jnp.zeros_like(qd)

    for _ in range(params.num_iterations):
        if pts_g is not None:
            v_g = _rows_dot_qd(Jg, qd)
            dl_g = relax * (b_g - v_g) / w_g * g_act[None]
            lam_g = lam_g + dl_g
            qd = qd + _hinv_matvec(Hinv, _rows_impulse(Jg, dl_g))
        if pts_a is not None:
            v_a = _rows_dot_qd(Ja, qd)
            dl_a = relax * (b_a - v_a) / w_a
            lam_a = lam_a + dl_a
            qd = qd + _hinv_matvec(Hinv, _rows_impulse(Ja, dl_a))
        v_c = _rows_dot_qd(J, qd)                            # (3, P, B)
        dv_n = b_n - v_c[2]
        lam_n = jnp.maximum(lam[2] + relax * dv_n / w_c[2], 0.0)
        lam_n = lam_n * active
        max_f = mu * lam_n
        lam_t1 = jnp.clip(lam[0] + relax * (-v_c[0]) / w_c[0],
                          -max_f, max_f)
        lam_t2 = jnp.clip(lam[1] + relax * (-v_c[1]) / w_c[1],
                          -max_f, max_f)
        lam_new = jnp.stack([lam_t1, lam_t2, lam_n], axis=0) * active[None]
        dlam = lam_new - lam
        lam = lam_new
        qd = qd + _hinv_matvec(Hinv, _rows_impulse(J, dlam))
        # joint limits (J = e_v)
        lam_lo_new = act_lo * jnp.maximum(
            lam_lo + relax * (b_lo - qd) / hinv_diag, 0.0)
        lam_hi_new = act_hi * jnp.maximum(
            lam_hi + relax * (b_hi + qd) / hinv_diag, 0.0)
        dlim = (lam_lo_new - lam_lo) - (lam_hi_new - lam_hi)
        lam_lo, lam_hi = lam_lo_new, lam_hi_new
        qd = qd + _hinv_matvec(Hinv, dlim)

    imp_dof = _rows_impulse(J, lam) + (lam_lo - lam_hi)
    return qd, lam, imp_dof


# ---------------------------------------------------------------------------
# Pallas wrapper


# the kernel's scoped-VMEM ceiling; the block picker budgets half of it to
# leave headroom for Mosaic's input/output pipelining buffers
_VMEM_LIMIT = 100 * 1024 * 1024


def _vmem_per_lane(nv: int, P: int, A: int, G: int, has_frames: bool) -> int:
    # envelope over the Mosaic stack allocator: J for every group plus a
    # handful of (rows, nv) iteration temporaries; the old fully-fused kernel
    # measured ~23x the raw J payload, the HJ-free loop carries ~1/3 of its
    # live set — 10x the payload is a comfortable margin
    rows = (P + A + G)
    base = 10 * rows * nv * 3 + 4 * nv * nv + 16 * nv
    if has_frames:
        base += 6 * P * nv
    return base


def _pick_block_ck(N: int, elems_per_lane: int):
    budget = _VMEM_LIMIT // 2 // 4
    for cand in (512, 256, 128, 64):
        if N % cand == 0 and elems_per_lane * cand <= budget:
            return cand
    return None


def supports(engine, N: int, dtype, P: int, A: int, G: int,
             has_frames: bool) -> bool:
    from . import dyn_kernel as dk
    if dtype != jnp.float32:
        return False
    if jax.default_backend() != "tpu" and not dk._FORCE_INTERPRET:
        return False
    return _pick_block_ck(
        N, _vmem_per_lane(engine.nv, P, A, G, has_frames)) is not None


def _tpu_params():
    from jax.experimental.pallas import tpu as pltpu
    cls = getattr(pltpu, "CompilerParams", None) or pltpu.TPUCompilerParams
    return cls(vmem_limit_bytes=_VMEM_LIMIT)


def solve_pallas(engine, S_bl, hinv_bl, qd, masks,
                 pts_c, b_n, mu, active, frames, w_c,
                 b_lo, b_hi, act_lo, act_hi,
                 pts_a=None, b_a=None, w_a=None,
                 pts_g=None, b_g=None, g_act=None, w_g=None):
    """Standard-layout dynamic inputs (N leading) except S_bl/hinv_bl, which
    arrive batch-last straight from the dynamics kernel.  w_c/w_a/w_g are the
    XLA-computed Delassus diagonals (N, K, 3).  Returns
    (qd (N, nv), lam (N, P, 3), imp_dof (N, nv))."""
    from jax.experimental import pallas as pl
    from . import dyn_kernel as dk

    N, nv = qd.shape
    P = b_n.shape[1]
    A = 0 if pts_a is None else pts_a.shape[1]
    G = 0 if pts_g is None else pts_g.shape[1]
    block = _pick_block_ck(N, _vmem_per_lane(nv, P, A, G, frames is not None))

    lane = lambda *lead: pl.BlockSpec(
        lead + (block,), lambda i: (0,) * len(lead) + (i,))
    whole = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))

    # static row masks ride as (tiny, grid-invariant) inputs — Pallas kernels
    # may not capture traced constants
    mask_keys = sorted(masks)
    names = ["mask_" + k for k in mask_keys]
    arrays = [jnp.asarray(masks[k], qd.dtype) for k in mask_keys]
    mask_specs = [whole(masks[k].shape) for k in mask_keys]
    cl = lambda x: jnp.transpose(x, (2, 1, 0))   # (N, K, 3) -> (3, K, N)
    names += ["S", "Hinv", "qd", "pts_c", "b_n", "mu", "active", "w_c",
              "b_lo", "b_hi", "act_lo", "act_hi"]
    arrays += [S_bl, hinv_bl, _bl(qd), cl(pts_c), _bl(b_n), _bl(mu),
               _bl(active), cl(w_c), _bl(b_lo), _bl(b_hi), _bl(act_lo),
               _bl(act_hi)]
    if frames is not None:
        names.append("frames")
        arrays.append(jnp.transpose(frames, (2, 3, 1, 0)))  # (3c, 3l, P, N)
    if pts_a is not None:
        names += ["pts_a", "b_a", "w_a"]
        arrays += [cl(pts_a), cl(b_a), cl(w_a)]
    if pts_g is not None:
        names += ["pts_g", "b_g", "g_act", "w_g"]
        arrays += [cl(pts_g), cl(b_g), _bl(g_act), cl(w_g)]

    def kernel(*refs):
        vals = {k: r[...] for k, r in zip(names, refs[: len(names)])}
        qd_ref, lam_ref, imp_ref = refs[len(names):]
        kmasks = {k: vals["mask_" + k] for k in mask_keys}
        qd_o, lam_o, imp_o = solve_bl(
            engine.params, vals["S"], vals["Hinv"], vals["qd"], kmasks,
            vals["pts_c"], vals["b_n"], vals["mu"], vals["active"],
            vals.get("frames"), vals["w_c"], vals["b_lo"], vals["b_hi"],
            vals["act_lo"], vals["act_hi"],
            vals.get("pts_a"), vals.get("b_a"), vals.get("w_a"),
            vals.get("pts_g"), vals.get("b_g"), vals.get("g_act"),
            vals.get("w_g"))
        qd_ref[...] = qd_o
        lam_ref[...] = lam_o
        imp_ref[...] = imp_o

    spec_of = {
        "S": lane(nv, 6), "Hinv": lane(nv, nv), "qd": lane(nv),
        "pts_c": lane(3, P), "b_n": lane(P), "mu": lane(P),
        "active": lane(P), "w_c": lane(3, P), "b_lo": lane(nv),
        "b_hi": lane(nv), "act_lo": lane(nv), "act_hi": lane(nv),
        "frames": lane(3, 3, P),
        "pts_a": lane(3, A), "b_a": lane(3, A), "w_a": lane(3, A),
        "pts_g": lane(3, G), "b_g": lane(3, G), "g_act": lane(G),
        "w_g": lane(3, G),
    }
    for k, spec in zip(names[: len(mask_keys)], mask_specs):
        spec_of[k] = spec
    qd_bl, lam_bl, imp_bl = pl.pallas_call(
        kernel,
        grid=(N // block,),
        in_specs=[spec_of[k] for k in names],
        out_specs=[lane(nv), lane(3, P), lane(nv)],
        out_shape=[
            jax.ShapeDtypeStruct((nv, N), qd.dtype),
            jax.ShapeDtypeStruct((3, P, N), qd.dtype),
            jax.ShapeDtypeStruct((nv, N), qd.dtype),
        ],
        interpret=dk._FORCE_INTERPRET,
        **({} if dk._FORCE_INTERPRET else {"compiler_params": _tpu_params()}),
    )(*arrays)
    return (jnp.transpose(qd_bl, (1, 0)), jnp.transpose(lam_bl, (2, 1, 0)),
            jnp.transpose(imp_bl, (1, 0)))
