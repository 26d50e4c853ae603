"""FrankaPPMA — multi-agent pick-and-place (reference tasks/franka_PPMA.py,
1166 LoC) — act 7.

Each agent is assigned its own cube (``cubeA_pos_relative`` per agent index,
not nearest) and must place it on its destination pad.  Per-agent 7-state FSM
(:561-596: approach -> hold -> lift -> align -> super-close -> release ->
GOAL, driven by the cube-to-destination relative vector) and a proximity
global FSM that flags agents too close to each other or to another agent's
cube (:598-625, gFSM == -1).  Obs (:74-82): all target poses (7T) + all
destination positions (3T) + all agent eef poses (7K) + self block
(cube-rel(3) + dest-rel(3) + base pose(7)) + [FSM, FSM] + gFSM.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.model import FIXED, GEOM_BOX, ModelBuilder, compose_scene
from ..physics.engine import Control, SimState
from ..utils.config import deep_merge
from .base import EnvState
from .franka_collect_ma import CollectTaskState, FrankaCollectMA
from .franka_reach_ma import (CUBE_SIZE, TABLE_HALF, TABLE_POS,
                              TABLE_SURFACE_Z, TASK_CFG as REACH_CFG)

TASK_CFG = deep_merge(REACH_CFG, {
    "name": "FrankaPPMA",
    "env": {"episodeLength": 300},
})

DEST_SIZE = 0.05


class FrankaPPMA(FrankaCollectMA):
    """Destination pads replace the wall; per-agent cube assignment."""

    def _obs_dim(self, K, T):
        # (ref :74-82)
        return 7 * T + 3 * T + 7 * K + (3 + 3 + 7) + 2 + 1

    def _dest_positions(self, T):
        xs = np.linspace(-0.2, 0.2, T) if T > 1 else np.array([0.0])
        return np.stack([
            xs, np.full(T, 0.4),
            np.full(T, TABLE_SURFACE_Z + DEST_SIZE / 2)], -1)

    def create_model(self):
        model, ground = FrankaCollectMA.__mro__[1].create_model(self)  # reach's
        T = self.num_targets
        dests = self._dest_positions(T)
        db = ModelBuilder()
        db.begin_actor()
        for t in range(T):
            body = db.add_body(f"dest{t}", -1, FIXED, body_pos=dests[t])
            db.add_geom(body, GEOM_BOX, (DEST_SIZE / 2, DEST_SIZE / 2, DEST_SIZE / 2),
                        density=None, contact=True, name="dest_geom")
        model = compose_scene([
            (model, (0, 0, 0), (0, 0, 0, 1)),
            (db.finalize(), (0, 0, 0), (0, 0, 0, 1))])
        self._index_model(model)
        self.dest_pos = jnp.asarray(dests, jnp.float32)
        return model, ground

    def build_engine(self, model, ground):
        from ..physics.engine import PhysicsEngine
        table_geoms = [i for i, g in enumerate(model.geoms) if g.name == "table_top"]
        dest_geoms = [i for i, g in enumerate(model.geoms) if g.name == "dest_geom"]
        cube_geoms = [i for i, g in enumerate(model.geoms) if g.name == "cubeA_geom"]
        hand_geoms = [i for i, g in enumerate(model.geoms) if g.name == "hand_sphere"]
        pairs = [(c, table_geoms[0]) for c in cube_geoms]
        for c in cube_geoms:
            for d in dest_geoms:
                pairs.append((c, d))
        for a in range(len(hand_geoms)):
            for b in range(a + 1, len(hand_geoms)):
                pairs.append((hand_geoms[a], hand_geoms[b]))
        grabs = []
        for gb in self._grip_bodies:
            for cb in self._cube_bodies:
                grabs.append((gb, (0, 0, 0), cb, (0, 0, 0)))
        return PhysicsEngine(model, self.sim_params, ground=ground,
                             pair_specs=pairs, grabs=grabs)

    # own-cube relative (agent k <-> cube k), not nearest
    def _assigned(self, eef_pos, cube):
        K = self.num_agents
        own = cube[:, :K]                       # (N, K, 3): cube k for agent k
        rel = own - eef_pos
        return own, rel

    def _fsm_pp(self, md, gripper_closed, dest_rel):
        fsm = jnp.zeros_like(md, dtype=jnp.int32)
        on_cube = md <= (CUBE_SIZE * 0.5 * 0.9)
        fsm = jnp.where(on_cube, 1, fsm)
        fsm = jnp.where(on_cube & gripper_closed, 2, fsm)
        lifted = jnp.abs(dest_rel[..., 2]) >= (DEST_SIZE + CUBE_SIZE) / 2
        fsm = jnp.where(on_cube & lifted, 3, fsm)
        aligned = jnp.linalg.norm(dest_rel[..., :2], axis=-1) < 0.025
        fsm = jnp.where(aligned, 4, fsm)
        stackable = jnp.abs(dest_rel[..., 2]) <= (CUBE_SIZE * 0.866 + DEST_SIZE / 2)
        fsm = jnp.where(aligned & stackable, 5, fsm)
        fsm = jnp.where(aligned & stackable & (~gripper_closed), 6, fsm)
        return fsm

    def _gfsm_proximity(self, eef_pos, cube):
        """gFSM == -1 when agents crowd each other (ref :598-625)."""
        K = self.num_envs  # noqa
        d_ep = jnp.linalg.norm(eef_pos[:, 1] - eef_pos[:, 0], axis=-1)
        too_close_e = jnp.repeat(d_ep <= 0.18, self.num_agents, 0)
        d01 = jnp.linalg.norm(eef_pos[:, 0] - cube[:, 1], axis=-1)
        d10 = jnp.linalg.norm(eef_pos[:, 1] - cube[:, 0], axis=-1)
        too_close_c = jnp.stack([d01, d10], -1).reshape(-1) <= 0.18
        return jnp.where(too_close_e | too_close_c, -1, 0)

    def pre_physics(self, state: EnvState, actions: jax.Array) -> Control:
        N, K, T = self.num_envs, self.num_agents, self.num_targets
        from .franka_reach_ma import FrankaReachMA
        ctrl = FrankaReachMA.pre_physics(self, state, actions)
        grip_target = jnp.where(actions[:, 6] >= 0.0, 0.035, 0.0)
        pos_target = ctrl.pos_target
        ge = grip_target.reshape(N, K)
        for k in range(K):
            for d in self.gripper_dofs[k]:
                pos_target = pos_target.at[:, d].set(ge[:, k])
        bx, _ = self.engine.fk(state.sim.q)
        eef = bx[:, self.grip_bodies]
        cube = self._cube_positions(state.sim)
        own, rel = self._assigned(eef, cube)
        md = jnp.linalg.norm(rel, axis=-1)
        holding = (md <= CUBE_SIZE * 0.5 * 0.9) \
            & (actions[:, 6].reshape(N, K) < 0.0)
        # agent k grabs its own cube k
        grab = jnp.zeros((N, K, T), jnp.float32)
        for k in range(min(K, T)):
            grab = grab.at[:, k, k].set(holding[:, k].astype(jnp.float32))
        return ctrl._replace(pos_target=pos_target,
                             grab_active=grab.reshape(N, K * T))

    def post_physics(self, state: EnvState, out, actions):
        N, K, T = self.num_envs, self.num_agents, self.num_targets
        B = N * K
        eef_pos = out.body_pos[:, self.grip_bodies]
        eef_quat = out.body_quat[:, self.grip_bodies]
        cube = self._cube_positions(state.sim)
        cube_quat = jnp.stack([
            state.sim.q[:, int(self.cube_q_adr[t]) + 3: int(self.cube_q_adr[t]) + 7]
            for t in range(T)], 1)
        own, rel = self._assigned(eef_pos, cube)
        md = jnp.linalg.norm(rel, axis=-1)
        dest_rel = self.dest_pos[None, :K] - own
        gripper_closed = actions[:, 6].reshape(N, K) < 0.0
        fsm = self._fsm_pp(md, gripper_closed, dest_rel)
        gfsm = self._gfsm_proximity(eef_pos, cube)

        all_target_pose = jnp.concatenate([cube, cube_quat], -1).reshape(N, 7 * T)
        all_dest = jnp.broadcast_to(self.dest_pos[:T].reshape(-1), (N, 3 * T))
        all_agent_pose = jnp.concatenate([eef_pos, eef_quat], -1).reshape(N, 7 * K)
        obs_env = jnp.concatenate([all_target_pose, all_dest, all_agent_pose], -1)
        obs_env = jnp.repeat(obs_env, K, 0)
        obs_self = jnp.concatenate([
            rel.reshape(B, 3), dest_rel.reshape(B, 3),
            jnp.tile(jnp.concatenate([self.base_pos, self.base_quat], -1), (N, 1)),
        ], -1)
        obs_fsm = jnp.concatenate([
            jnp.stack([fsm.reshape(B)] * 2, -1).astype(jnp.float32),
            gfsm.reshape(B, 1).astype(jnp.float32)], -1)
        obs = jnp.concatenate([obs_env, obs_self, obs_fsm], -1)

        # staged reward toward the destination
        mdf = md.reshape(B)
        fsm_f = fsm.reshape(B)
        ga = actions[:, 6]
        dz = jnp.abs(dest_rel[..., 2]).reshape(B)
        dxy = jnp.linalg.norm(dest_rel[..., :2], axis=-1).reshape(B)
        r = jnp.zeros(B)
        r += jnp.where(fsm_f == 0, jnp.exp(-5.0 * mdf**2), 0.0)
        r += jnp.where(fsm_f == 1, jnp.exp(-1.0 * ga), 0.0)
        r += jnp.where(fsm_f == 2, jnp.exp(-5.0 * dxy**2), 0.0)
        r += jnp.where(fsm_f == 3, jnp.exp(-5.0 * dxy**2), 0.0)
        r += jnp.where(fsm_f == 4, jnp.exp(-5.0 * dz**2), 0.0)
        r += jnp.where(fsm_f == 5, jnp.exp(4.0 * ga), 0.0)
        r += jnp.where(fsm_f == 6, 3.0, 0.0)
        r += fsm_f.astype(jnp.float32)                  # BSR
        r += jnp.where(gfsm.reshape(B) < 0, -1.0, 0.0)  # crowding punishment
        rew = jnp.maximum(r, 0.0)

        reset = jnp.where(state.progress >= self.max_episode_length - 1, 1, 0)
        task = CollectTaskState(actions=actions, fsm=fsm)
        return obs, None, rew, reset.astype(jnp.int32), task, {}
