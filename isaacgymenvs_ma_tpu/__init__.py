"""isaacgymenvs_ma_tpu — TPU-native rebuild of IsaacGymEnvs-MA.

A from-scratch JAX/XLA framework with the capabilities of
Xhadow0823/IsaacGymEnvs-MA: batched rigid-body physics, the IsaacGymEnvs task
suite (incl. the fork's multi-agent Franka tasks), an rl_games-equivalent PPO
learner, domain randomization, and pod-scale sharding — all under one jit.

Public API mirrors the reference's ``isaacgymenvs.make()``
(reference isaacgymenvs/__init__.py:14-55).
"""
__version__ = "0.1.0"

# Physics (mass-matrix inversion, contact Delassus operators) must run in
# real float32: the TPU MXU's default bfloat16 matmul precision makes the
# dynamics diverge (NaNs within ~25 PPO epochs on Ant).  The networks here
# are tiny, so the fleet-wide cost of 'float32' precision is negligible.
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "float32")

from .api import make  # noqa: F401
