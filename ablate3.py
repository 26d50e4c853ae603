import time, jax, jax.numpy as jnp, numpy as np
from isaacgymenvs_ma_tpu.tasks.ant import Ant, TASK_CFG
from isaacgymenvs_ma_tpu.utils.config import deep_merge

task = Ant(deep_merge(TASK_CFG, {"env": {"numEnvs": 4096}}))
eng = task.engine
state = task.initial_state(jax.random.PRNGKey(0))
q, qd = state.sim.q, state.sim.qd
from isaacgymenvs_ma_tpu.physics.engine import Control
ctrl = Control(tau=jnp.zeros((4096, eng.nv)))

def scan_time(name, fn, init, iters=200, reps=3):
    f = jax.jit(lambda x: jax.lax.scan(lambda c, _: (fn(c), None), x, None, length=iters)[0])
    out = f(init); jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); out = f(init); jax.block_until_ready(out)
        best = min(best, time.perf_counter()-t0)
    print(f"{name}: {best/iters*1e3:.4f} ms/iter")

# full substep
def sub(c):
    q, qd = c
    q2, qd2, aux = eng.substep(q, qd, ctrl)
    return (q2, qd2)
scan_time("full substep", sub, (q, qd))

# FK only
def fk_only(c):
    q, qd = c
    bx, bq = eng.fk(q)
    return (q + 1e-12*bx[:, 0, 0:1]*0 + 1e-12*bx.sum()*0 + 1e-9*bx[:,0,:].sum(), qd)
def fk2(c):
    q, qd = c
    bx, bq = eng.fk(q)
    return (q * (1.0 + 1e-20*bx.sum()), qd)
scan_time("fk only", fk2, (q, qd))

# fk + S + V + I_O
def kin(c):
    q, qd = c
    bx, bq = eng.fk(q)
    S = eng.dof_motion(bx, bq)
    V = eng.body_velocities(S, qd)
    I_O, _ = eng.spatial_inertia(bx, bq)
    return (q * (1.0 + 1e-20*(S.sum()+V.sum()+I_O.sum())), qd)
scan_time("fk+S+V+I", kin, (q, qd))

# + M + C
def dyn(c):
    q, qd = c
    bx, bq = eng.fk(q)
    S = eng.dof_motion(bx, bq)
    V = eng.body_velocities(S, qd)
    I_O, _ = eng.spatial_inertia(bx, bq)
    M = eng.mass_matrix(S, I_O)
    C = eng.bias_force(S, qd, V, I_O)
    return (q * (1.0 + 1e-20*(M.sum()+C.sum())), qd)
scan_time("fk..M,C", dyn, (q, qd))

# + inv
def dyn2(c):
    q, qd = c
    bx, bq = eng.fk(q)
    S = eng.dof_motion(bx, bq)
    V = eng.body_velocities(S, qd)
    I_O, _ = eng.spatial_inertia(bx, bq)
    M = eng.mass_matrix(S, I_O)
    C = eng.bias_force(S, qd, V, I_O)
    Hinv = jnp.linalg.inv(M + eng._diag_embed(jnp.broadcast_to(eng.dof_armature,(4096,eng.nv)).astype(q.dtype)))
    return (q * (1.0 + 1e-20*(Hinv.sum()+C.sum())), qd)
scan_time("fk..Hinv", dyn2, (q, qd))
