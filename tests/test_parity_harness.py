"""Recorded-trajectory parity harness tests (VERDICT round-1 item 8).

Self-test: our own Cartpole capture replays bit-exactly through the harness
(same program, same seed), proving the mechanics.  Reference captures — when
the driver provides them under IGMA_REFERENCE_TRAJ_DIR or
tests/data/reference_traj (format: utils/parity.py docstring) — are replayed
automatically and asserted to track within their tolerance up to the first
reset (reset RNG streams legitimately differ, docs/reproducibility.md).

Plus an independent-physics cross-check on BallBalance (the round-1
Lagrangian Cartpole check extended to the contact tier): the ball's free
flight between launch and tray contact must match closed-form projectile
motion.
"""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaacgymenvs_ma_tpu.utils import parity


def test_harness_self_roundtrip_cartpole():
    from isaacgymenvs_ma_tpu.tasks import registry
    from isaacgymenvs_ma_tpu.utils.config import load_task_config
    cfg = load_task_config("Cartpole", ["env.numEnvs=8"])
    task = registry.create_task("Cartpole", cfg, seed=7)
    st = task.initial_state(jax.random.PRNGKey(7))
    key = jax.random.PRNGKey(3)
    acts = np.asarray(jax.random.uniform(key, (20, 8, 1), minval=-1,
                                         maxval=1), np.float32)
    cap = parity.record(task, st, acts)
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "cartpole.npz")
        np.savez(p, **cap)
        rep = parity.replay(p, seed=7)
    # identical program + identical seed -> bitwise identical replay
    assert rep.first_divergence == -1, rep
    assert rep.max_obs_err == 0.0 and rep.reset_mismatches == 0


def test_reference_captures_if_provided():
    d = parity.reference_capture_dir()
    if d is None:
        pytest.skip("no reference captures provided "
                    "(set IGMA_REFERENCE_TRAJ_DIR)")
    files = [f for f in sorted(os.listdir(d)) if f.endswith(".npz")]
    assert files, f"{d} exists but holds no .npz captures"
    for f in files:
        rep = parity.replay(os.path.join(d, f))
        cap = np.load(os.path.join(d, f))
        first_reset = int(np.argmax(cap["reset"].any(axis=1))) \
            if cap["reset"].any() else rep.steps
        # must track at least to the first reset (post-reset divergence is
        # expected: torch vs jax reset RNG streams)
        assert rep.first_divergence == -1 \
            or rep.first_divergence >= first_reset, (f, rep)


def test_ballbalance_free_flight_matches_projectile():
    """Independent model: between reset launch and tray contact the ball is
    ballistic — positions must match closed-form projectile motion."""
    from isaacgymenvs_ma_tpu.tasks import registry
    from isaacgymenvs_ma_tpu.utils.config import load_task_config
    cfg = load_task_config("BallBalance", ["env.numEnvs=4"])
    task = registry.create_task("BallBalance", cfg, seed=5)
    st = task.initial_state(jax.random.PRNGKey(5))
    step = jax.jit(task.step)
    acts = jnp.zeros((4, task.num_actions))

    ball = task.model.body_names.index("ball")
    qa = int(task.model.q_adr[ball])
    va = int(task.model.v_adr[ball])

    # the first step performs the reset (reset_buf inits to 1) and launches
    # the ball — take the ballistic baseline AFTER it
    st, _ = step(st, acts)
    p0 = np.asarray(st.sim.q[:, qa: qa + 3])
    v0 = np.asarray(st.sim.qd[:, va: va + 3])  # FREE: linear dofs first
    dt = task.sim_params.dt
    g = np.asarray(task.sim_params.gravity)

    # compare the next few steps, which the reset distribution guarantees
    # are airborne (ball launched well above the tray)
    sim_p = []
    for i in range(3):
        st, _ = step(st, acts)
        sim_p.append(np.asarray(st.sim.q[:, qa: qa + 3]))

    # semi-implicit Euler closed form over the substep grid
    sub = task.sim_params.substeps
    h = dt / sub
    for i in range(3):
        n = (i + 1) * sub
        # v_k = v0 + k h g ; p_n = p0 + h * sum_{k=1..n} v_k
        pred = p0 + h * (n * v0 + g[None] * h * (n * (n + 1) / 2))
        err = np.abs(sim_p[i] - pred).max()
        # bf16 dynamics-chain matmuls accumulate ~4e-4 relative drift/step
        # (BASELINE.md precision ladder); gross integrator errors are 100x
        assert err < 1e-3 * (i + 1), (i, err)
