"""AllegroHandDextreme{ManualDR,ADR} (reference
tasks/dextreme/allegro_hand_dextreme.py, 1688 LoC).

Dextreme = Allegro in-hand cube reorientation hardened for sim-to-real:

* **dict observations** (``dict_obs_cls = True`` — ref :57): the policy sees
  named groups (dof_pos, object_pose, goal_pose, relative rotation, last
  actions); the asymmetric critic additionally sees velocities, dof forces and
  fingertip wrenches.  Here the flat obs vector is the concatenation of
  ``obs_spec`` groups and :meth:`split_obs` recovers the dict view (the
  ComplexObsRLGPUEnv contract, rlgames_utils.py:300-424).
* **cube-pose camera-noise model** (ref pose-estimation corruption): the
  observed object pose gets gaussian position/rotation noise plus occasional
  large "unreliable tracking" jumps.
* **RandomNetworkAdversary** action perturbation (utils/rna_util.py:37):
  actions are blended with a fixed random network's output; dropout masks
  refresh every ``rnaRefreshInterval`` steps.
* **ADR** (ADR variant — tasks/dextreme/adr_vec_task.py): the DR parameter
  ranges themselves adapt via boundary-worker performance, driving both the
  engine's per-env PhysScales and the noise magnitudes.  The ADR ranges are
  part of the checkpointable env state (``get_env_state``).

TPU redesign: ADR state and per-env sampled parameter rows live in the task
pytree; everything (sampling, boundary bookkeeping, range updates, noise)
happens inside the jitted step — no host-side queues.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import maths
from ..physics.engine import Control, SimState
from ..utils.adr import ADR, ADRConfig, ADRState
from ..utils.config import deep_merge
from ..utils.domain_rand import PhysScales
from ..utils.rna_util import RandomNetworkAdversary, RNAState
from .allegro_hand import AllegroHand, TASK_CFG as ALLEGRO_CFG
from .base import EnvState, masked_update
from .shadow_hand import HandTaskState

TASK_CFG = deep_merge(ALLEGRO_CFG, {
    "name": "AllegroHandDextremeManualDR",
    "env": {
        "numEnvs": 8192,
        "observationType": "full_state",
        "asymmetric_observations": True,
        # camera-noise model (ref cube pose corruption)
        "cubePosNoise": 0.01,
        "cubeRotNoise": 0.05,
        "unreliableProb": 0.05,
        "unreliablePosJump": 0.1,
        "unreliableRotJump": 0.5,
        # RNA (ref rna perturbation config)
        "rnaEnabled": True,
        "rnaAlpha": 0.2,
        "rnaProb": 0.2,
        "rnaRefreshInterval": 600,
        "actionNoise": 0.02,
    },
})

# ADR parameter table: 4 engine PhysScales factors + 4 noise magnitudes.
ADR_PARAMS = ("mass", "damping", "stiffness", "friction",
              "action_noise", "cube_pos_noise", "cube_rot_noise", "rna_alpha")
_ADR_CFG = ADRConfig(
    names=ADR_PARAMS,
    init_lo=(0.95, 0.95, 0.95, 0.95, 0.00, 0.000, 0.00, 0.00),
    init_hi=(1.05, 1.05, 1.05, 1.05, 0.01, 0.005, 0.02, 0.05),
    limit_lo=(0.4, 0.4, 0.4, 0.4, 0.0, 0.0, 0.0, 0.0),
    limit_hi=(2.0, 2.0, 2.0, 2.0, 0.1, 0.04, 0.3, 0.5),
    delta=(0.02, 0.02, 0.02, 0.02, 0.005, 0.002, 0.01, 0.02),
    queue_size=128, threshold_low=1.0, threshold_high=3.0,
    worker_fraction=0.25)


class DextremeTaskState(NamedTuple):
    hand: HandTaskState
    rna: RNAState
    step_count: jax.Array               # scalar int32 (RNA refresh clock)
    adr: Optional[ADRState] = None      # ADR variant only
    adr_params: Optional[jax.Array] = None  # (N, P) per-env sampled values


class AllegroHandDextremeManualDR(AllegroHand):
    """Fixed-magnitude DR variant (ref AllegroHandDextremeManualDR)."""

    dict_obs_cls = True
    use_adr = False

    def __init__(self, cfg):
        e = cfg["env"]
        # policy obs groups (ref obs_spec names); critic gets the rest
        self.obs_spec = [
            ("dof_pos", 16),
            ("object_pose", 7),
            ("goal_pose", 7),
            ("goal_relative_rot", 4),
            ("last_actions", 16),
        ]
        self.state_spec = self.obs_spec + [
            ("dof_vel", 16),
            ("dof_force", 16),
            ("object_vels", 6),
            ("ft_force_torques", 24),
        ]
        e["numObservations"] = sum(s for _, s in self.obs_spec)
        e["numStates"] = sum(s for _, s in self.state_spec)
        e["asymmetric_observations"] = True
        self.cube_pos_noise = float(e.get("cubePosNoise", 0.01))
        self.cube_rot_noise = float(e.get("cubeRotNoise", 0.05))
        self.unreliable_prob = float(e.get("unreliableProb", 0.05))
        self.unreliable_pos_jump = float(e.get("unreliablePosJump", 0.1))
        self.unreliable_rot_jump = float(e.get("unreliableRotJump", 0.5))
        self.rna_enabled = bool(e.get("rnaEnabled", True))
        self.rna_alpha = float(e.get("rnaAlpha", 0.2))
        self.rna_prob = float(e.get("rnaProb", 0.2))
        self.rna_refresh = int(e.get("rnaRefreshInterval", 600))
        self.action_noise = float(e.get("actionNoise", 0.02))
        super().__init__(cfg)
        # ShadowHand.__init__ overwrote numObservations via obs_dims; restore
        self.num_obs = sum(s for _, s in self.obs_spec)
        self.num_states = sum(s for _, s in self.state_spec)
        self.rna = RandomNetworkAdversary(
            num_obs=self.num_hand_dofs, num_actions=self.num_actions,
            units=(256, 256))

    # -- dict-obs surface ----------------------------------------------
    def split_obs(self, flat: jax.Array, spec=None) -> dict:
        spec = spec or self.obs_spec
        out, i = {}, 0
        for name, size in spec:
            out[name] = flat[..., i: i + size]
            i += size
        return out

    def split_states(self, flat: jax.Array) -> dict:
        return self.split_obs(flat, self.state_spec)

    # -- per-env DR magnitudes (ManualDR: fixed; ADR: from adr_params) --
    def _noise_mags(self, task: DextremeTaskState):
        n = self.num_envs
        ones = jnp.ones((n,), jnp.float32)
        return {"action_noise": self.action_noise * ones,
                "cube_pos_noise": self.cube_pos_noise * ones,
                "cube_rot_noise": self.cube_rot_noise * ones,
                "rna_alpha": self.rna_alpha * ones}

    # -- lifecycle ------------------------------------------------------
    def initial_task_state(self):
        hand = super().initial_task_state()
        rna = self.rna.init(jax.random.PRNGKey(97))
        return DextremeTaskState(hand=hand, rna=rna,
                                 step_count=jnp.asarray(0, jnp.int32))

    def _hand(self, task):
        return task.hand

    def pre_physics(self, state: EnvState, actions: jax.Array) -> Control:
        task: DextremeTaskState = state.task
        key = jax.random.fold_in(state.rng, 7)
        k_n, k_p, k_r = jax.random.split(key, 3)
        mags = self._noise_mags(task)
        # white action noise + RNA structured perturbation (ref :57, rna_util)
        actions = actions + mags["action_noise"][:, None] * \
            jax.random.normal(k_n, actions.shape)
        if self.rna_enabled:
            dof_pos = self.engine.dof_pos(state.sim)[:, : self.num_hand_dofs]
            adv = self.rna(task.rna, dof_pos)
            use = (jax.random.uniform(k_p, (self.num_envs,)) < self.rna_prob)
            alpha = jnp.where(use, mags["rna_alpha"], 0.0)[:, None]
            actions = (1.0 - alpha) * actions + alpha * adv
        actions = jnp.clip(actions, -1.0, 1.0)
        # masks refresh on the DR clock (ref refresh cadence)
        refresh = (task.step_count % self.rna_refresh) == 0
        fresh = self.rna.refresh(task.rna)
        rna = RNAState(
            params=task.rna.params,
            masks=tuple(jnp.where(refresh, f, o)
                        for f, o in zip(fresh.masks, task.rna.masks)),
            key=jnp.where(refresh, fresh.key, task.rna.key))
        self._task_updates = dict(rna=rna, step_count=task.step_count + 1)
        # delegate position-target drive to the hand task
        hand_state = state._replace(task=task.hand)
        return super().pre_physics(hand_state, actions)

    def reset_idx(self, sim: SimState, task: DextremeTaskState, mask, key):
        sim, hand = super().reset_idx(sim, task.hand, mask, key)
        return sim, task._replace(hand=hand)

    def post_physics(self, state: EnvState, out, actions):
        task: DextremeTaskState = state.task
        n = self.num_envs
        hand_state = state._replace(task=task.hand)
        _, _, rew, reset, hand, extras = super().post_physics(
            hand_state, out, actions)

        # ---- dict observations with the camera-noise model ----
        key = jax.random.fold_in(state.rng, 13)
        ks = jax.random.split(key, 5)
        mags = self._noise_mags(task)
        obj = out.root_states[:, 1]
        obj_pos, obj_rot = obj[:, 0:3], obj[:, 3:7]
        unreliable = (jax.random.uniform(ks[0], (n,)) < self.unreliable_prob)
        pos_std = jnp.where(unreliable, self.unreliable_pos_jump,
                            mags["cube_pos_noise"])
        rot_std = jnp.where(unreliable, self.unreliable_rot_jump,
                            mags["cube_rot_noise"])
        noisy_pos = obj_pos + pos_std[:, None] * jax.random.normal(ks[1], (n, 3))
        axis = jax.random.normal(ks[2], (n, 3))
        axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True),
                                  1e-8)
        ang = rot_std * jax.random.normal(ks[3], (n,))
        noisy_rot = maths.quat_mul(maths.quat_from_angle_axis(ang, axis),
                                   obj_rot)

        nh = self.num_hand_dofs
        dof_pos = self.engine.dof_pos(state.sim)[:, :nh]
        dof_vel = self.engine.dof_vel(state.sim)[:, :nh]
        from .shadow_hand import GOAL_POS
        goal_pos = jnp.broadcast_to(jnp.asarray(GOAL_POS, jnp.float32),
                                    (n, 3))
        rel = maths.quat_mul(noisy_rot, maths.quat_conjugate(hand.goal_rot))
        obs = jnp.concatenate([
            maths.unscale(dof_pos, self.dof_lower, self.dof_upper),
            noisy_pos, noisy_rot,
            goal_pos, hand.goal_rot,
            rel,
            actions,
        ], -1)
        # critic sees the TRUE (noise-free) simulator state
        true_rel = maths.quat_mul(obj_rot, maths.quat_conjugate(hand.goal_rot))
        states = jnp.concatenate([
            maths.unscale(dof_pos, self.dof_lower, self.dof_upper),
            obj_pos, obj_rot, goal_pos, hand.goal_rot, true_rel, actions,
            self.vel_obs_scale * dof_vel,
            self.force_torque_obs_scale * out.dof_force[:, self.hand_dofs],
            obj[:, 7:13],
            self.force_torque_obs_scale * out.sensor_forces.reshape(n, -1),
        ], -1)

        task = task._replace(hand=hand, **self._task_updates)
        task = self._adr_update(task, reset, hand)
        return obs, states, rew, reset, task, extras

    def _adr_update(self, task, reset, hand):
        return task

    def get_env_state(self, state: EnvState):
        return None


class AllegroHandDextremeADR(AllegroHandDextremeManualDR):
    """ADR variant: DR magnitudes + PhysScales ranges adapt via boundary
    workers (ref AllegroHandDextremeADR / adr_vec_task.py)."""

    use_adr = True

    def __init__(self, cfg):
        super().__init__(cfg)
        self.adr = ADR(_ADR_CFG, self.num_envs)

    def initial_task_state(self):
        base = super().initial_task_state()
        st = self.adr.init()
        params = self.adr.sample(jax.random.PRNGKey(3), st)
        return base._replace(adr=st, adr_params=params)

    def initial_phys(self, key=None):
        return PhysScales.ones(self.num_envs)

    def update_phys(self, state: EnvState, reset_mask, key):
        p = state.task.adr_params
        return PhysScales(mass=p[:, 0:1], damping=p[:, 1:2],
                          stiffness=p[:, 2:3], friction=p[:, 3:4])

    def _noise_mags(self, task: DextremeTaskState):
        p = task.adr_params
        return {"action_noise": p[:, 4], "cube_pos_noise": p[:, 5],
                "cube_rot_noise": p[:, 6], "rna_alpha": p[:, 7]}

    def reset_idx(self, sim: SimState, task: DextremeTaskState, mask, key):
        sim, task = super().reset_idx(sim, task, mask, key)
        fresh = self.adr.sample(jax.random.fold_in(key, 11), task.adr)
        params = masked_update(mask, fresh, task.adr_params)
        return sim, task._replace(adr_params=params)

    def _adr_update(self, task: DextremeTaskState, reset, hand):
        # boundary performance = consecutive successes achieved this episode
        st = self.adr.observe(task.adr, reset > 0, hand.successes)
        return task._replace(adr=st)

    def post_physics(self, state, out, actions):
        obs, states, rew, reset, task, extras = super().post_physics(
            state, out, actions)
        extras = dict(extras)
        extras["adr_npd"] = self.adr.npd(task.adr)
        return obs, states, rew, reset, task, extras

    def get_env_state(self, state: EnvState):
        """ADR ranges persist into checkpoints (adr_load_from_checkpoint —
        docs/domain_randomization.md:337)."""
        return {"adr": state.task.adr}

    def set_env_state(self, state: EnvState, env_state):
        if env_state and "adr" in env_state:
            return state._replace(
                task=state.task._replace(adr=env_state["adr"]))
        return state
