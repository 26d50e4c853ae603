"""Domain randomization engine (reference ``vec_task.py:612-842`` +
``utils/dr_utils.py``), TPU-native.

The reference mutates PhysX actor properties through host-side setter maps
(``dr_utils.py:35-69``), needs value "bucketing" to bound GPU buffer growth
(:135-146), and randomizes obs/actions with schedule-scaled noise.  Here the
physics core is already batched, so per-env physical parameters are just
batched leaves of a :class:`PhysScales` pytree resampled (masked, at reset)
inside the jitted step — no bucketing, no host calls.

Schema-compatible with the reference's ``randomization_params`` tree
(cfg/task/Ant.yaml:66-105): ``frequency``, ``observations``/``actions`` noise
specs ({range, operation: additive|scaling, distribution: gaussian|uniform|
loguniform, schedule: linear|constant}), and ``actor_params.<actor>.
{rigid_body_properties.mass, dof_properties.{damping,stiffness,friction}}``
as scaling/additive factors.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class PhysScales(NamedTuple):
    """Per-env multiplicative physics factors consumed by the engine."""

    mass: jax.Array        # (N, 1) or (N, nb)
    damping: jax.Array     # (N, 1) or (N, nv) — passive + drive damping
    stiffness: jax.Array   # (N, 1) or (N, nv) — drive kp
    friction: jax.Array    # (N, 1) contact friction

    @staticmethod
    def ones(n: int) -> "PhysScales":
        one = jnp.ones((n, 1), jnp.float32)
        return PhysScales(one, one, one, one)


def _schedule_factor(spec: dict, frames) -> jax.Array:
    sched = spec.get("schedule", None)
    steps = float(spec.get("schedule_steps", 1)) or 1.0
    if sched == "linear":
        return jnp.minimum(frames / steps, 1.0)
    if sched == "constant":
        return (frames >= steps).astype(jnp.float32)
    return jnp.asarray(1.0, jnp.float32)


def _sample(key, spec: dict, shape, frames):
    """Draw a noise/scale sample per the reference's generate_random_samples
    (dr_utils.py:71-133)."""
    lo, hi = spec.get("range", [0.0, 1.0])
    dist = spec.get("distribution", "uniform")
    op = spec.get("operation", "additive")
    sf = _schedule_factor(spec, frames)
    if dist == "gaussian":
        mu, var = lo, hi
        if op == "additive":
            mu, var = mu * sf, var * sf
        else:  # scaling: anneal toward identity
            var = var * sf
            mu = mu * sf + 1.0 * (1.0 - sf)
        return mu + var * jax.random.normal(key, shape)
    if dist == "loguniform":
        lo_s, hi_s = jnp.log(jnp.maximum(lo, 1e-8)), jnp.log(jnp.maximum(hi, 1e-8))
        u = jax.random.uniform(key, shape, minval=lo_s, maxval=hi_s)
        samples = jnp.exp(u)
    else:
        samples = jax.random.uniform(key, shape, minval=lo, maxval=hi)
    if op == "additive":
        return samples * sf
    return samples * sf + 1.0 * (1.0 - sf)


class DomainRandomizer:
    """Holds the parsed spec; all apply/resample methods are pure."""

    def __init__(self, params: dict, num_envs: int):
        self.params = params or {}
        self.num_envs = num_envs
        self.frequency = int(self.params.get("frequency", 600))
        self.obs_spec = self.params.get("observations")
        self.act_spec = self.params.get("actions")
        # flatten actor_params into (mass, damping, stiffness, friction) specs
        self.mass_spec = None
        self.damping_spec = None
        self.stiffness_spec = None
        self.friction_spec = None
        for actor, props in (self.params.get("actor_params") or {}).items():
            rb = props.get("rigid_body_properties", {})
            if "mass" in rb:
                self.mass_spec = rb["mass"]
            dp = props.get("dof_properties", {})
            if "damping" in dp:
                self.damping_spec = dp["damping"]
            if "stiffness" in dp:
                self.stiffness_spec = dp["stiffness"]
            rs = props.get("rigid_shape_properties", {})
            if "friction" in rs:
                self.friction_spec = rs["friction"]

    @property
    def enabled(self) -> bool:
        return bool(self.params)

    # -- noise -----------------------------------------------------------
    def randomize_actions(self, key, actions, frames=1e9):
        if not self.act_spec:
            return actions
        noise = _sample(key, self.act_spec, actions.shape, frames)
        if self.act_spec.get("operation", "additive") == "additive":
            return actions + noise
        return actions * noise

    def randomize_observations(self, key, obs, frames=1e9):
        if not self.obs_spec:
            return obs
        noise = _sample(key, self.obs_spec, obs.shape, frames)
        if self.obs_spec.get("operation", "additive") == "additive":
            return obs + noise
        return obs * noise

    # -- physics ---------------------------------------------------------
    def resample_phys(self, key, mask, phys: PhysScales, frames=1e9) -> PhysScales:
        """Masked per-env resample (DR happens at reset — tasks/ant.py:252-255)."""
        n = self.num_envs
        ks = jax.random.split(key, 4)
        m = mask[:, None]

        def upd(spec, k, cur):
            if not spec:
                return cur
            new = _sample(k, spec, (n, 1), frames)
            if spec.get("operation") == "additive":
                new = 1.0 + new  # additive on a multiplicative factor
            return jnp.where(m, new, cur)

        return PhysScales(
            mass=upd(self.mass_spec, ks[0], phys.mass),
            damping=upd(self.damping_spec, ks[1], phys.damping),
            stiffness=upd(self.stiffness_spec, ks[2], phys.stiffness),
            friction=upd(self.friction_spec, ks[3], phys.friction),
        )
