"""Actor-critic networks (rl_games network-builder equivalent).

Mirrors the rl_games ``actor_critic`` continuous network the reference trains
with (``cfg/train/AntPPO.yaml``: shared MLP trunk, ELU, fixed learnable
log-sigma, mu + value heads).  Configured from the same
``params.network`` schema.  bf16 is intentionally not used: these MLPs are
tiny and f32 keeps the learner bit-stable; the MXU win on TPU comes from the
large batch dimension.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

_ACT = {
    "elu": nn.elu,
    "relu": nn.relu,
    "tanh": jnp.tanh,
    "selu": nn.selu,
    "swish": nn.swish,
    "sigmoid": nn.sigmoid,
    "None": lambda x: x,
    None: lambda x: x,
}


class MLP(nn.Module):
    units: Sequence[int]
    activation: str = "elu"

    @nn.compact
    def __call__(self, x):
        act = _ACT[self.activation]
        for u in self.units:
            x = act(nn.Dense(u)(x))
        return x


class ActorCritic(nn.Module):
    """Continuous-action actor-critic with optional separate critic trunk."""

    num_actions: int
    units: Sequence[int] = (256, 128, 64)
    activation: str = "elu"
    separate: bool = False
    fixed_sigma: bool = True
    sigma_init: float = 0.0
    value_size: int = 1

    @nn.compact
    def __call__(self, obs):
        trunk = MLP(self.units, self.activation, name="actor_mlp")(obs)
        mu = nn.Dense(self.num_actions, name="mu",
                      kernel_init=nn.initializers.variance_scaling(
                          0.01, "fan_in", "truncated_normal"))(trunk)
        if self.separate:
            vtrunk = MLP(self.units, self.activation, name="critic_mlp")(obs)
        else:
            vtrunk = trunk
        value = nn.Dense(self.value_size, name="value")(vtrunk)
        if self.fixed_sigma:
            log_sigma = self.param(
                "log_sigma", nn.initializers.constant(self.sigma_init),
                (self.num_actions,))
            log_sigma = jnp.broadcast_to(log_sigma, mu.shape)
        else:
            log_sigma = nn.Dense(self.num_actions, name="sigma")(trunk)
        return mu, log_sigma, value.squeeze(-1)


class CentralValueNet(nn.Module):
    """Asymmetric critic on privileged states (rl_games central_value_config,
    cfg/train/ShadowHandPPOAsymm.yaml:73-88)."""

    units: Sequence[int] = (256, 128)
    activation: str = "elu"

    @nn.compact
    def __call__(self, states):
        x = MLP(self.units, self.activation, name="cv_mlp")(states)
        return nn.Dense(1, name="value")(x).squeeze(-1)


class AsymActorCritic(nn.Module):
    """Actor on obs + central-value critic on privileged states."""

    num_actions: int
    units: Sequence[int] = (256, 128, 64)
    cv_units: Sequence[int] = (256, 128)
    activation: str = "elu"
    fixed_sigma: bool = True
    sigma_init: float = 0.0

    @nn.compact
    def __call__(self, obs, states):
        trunk = MLP(self.units, self.activation, name="actor_mlp")(obs)
        mu = nn.Dense(self.num_actions, name="mu",
                      kernel_init=nn.initializers.variance_scaling(
                          0.01, "fan_in", "truncated_normal"))(trunk)
        if self.fixed_sigma:
            log_sigma = self.param(
                "log_sigma", nn.initializers.constant(self.sigma_init),
                (self.num_actions,))
            log_sigma = jnp.broadcast_to(log_sigma, mu.shape)
        else:
            log_sigma = nn.Dense(self.num_actions, name="sigma")(trunk)
        vtrunk = MLP(self.cv_units, self.activation, name="critic_mlp")(states)
        value = nn.Dense(1, name="value")(vtrunk)
        return mu, log_sigma, value.squeeze(-1)


def build_network(net_cfg: dict, num_actions: int) -> ActorCritic:
    """Construct from the rl_games ``params.network`` schema."""
    mlp = net_cfg.get("mlp", {})
    space = net_cfg.get("space", {}).get("continuous", {})
    sigma_init = space.get("sigma_init", {}).get("val", 0.0)
    return ActorCritic(
        num_actions=num_actions,
        units=tuple(mlp.get("units", (256, 128, 64))),
        activation=mlp.get("activation", "elu"),
        separate=bool(net_cfg.get("separate", False)),
        fixed_sigma=bool(space.get("fixed_sigma", True)),
        sigma_init=float(sigma_init),
    )


def gaussian_neglogp(mu, log_sigma, actions):
    """Diagonal-gaussian negative log prob (rl_games distr semantics)."""
    var = jnp.exp(2.0 * log_sigma)
    return 0.5 * jnp.sum(
        jnp.square(actions - mu) / var + 2.0 * log_sigma + jnp.log(2.0 * jnp.pi),
        axis=-1,
    )


def gaussian_entropy(log_sigma):
    return jnp.sum(log_sigma + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e), axis=-1)


def gaussian_kl(mu0, log_s0, mu1, log_s1):
    """KL(p0 || p1) for diagonal gaussians (rl_games dist kl)."""
    v0, v1 = jnp.exp(2 * log_s0), jnp.exp(2 * log_s1)
    return jnp.sum(
        log_s1 - log_s0 + (v0 + jnp.square(mu0 - mu1)) / (2.0 * v1) - 0.5, axis=-1)


class ActorCriticLSTM(nn.Module):
    """MLP trunk -> LSTM -> heads (rl_games ``rnn: {name: lstm}`` networks,
    e.g. cfg/train/ShadowHandPPOLSTM; trained with seq_len truncated BPTT)."""

    num_actions: int
    units: Sequence[int] = (256, 128, 64)
    lstm_units: int = 256
    activation: str = "elu"
    fixed_sigma: bool = True
    sigma_init: float = 0.0

    @nn.compact
    def __call__(self, obs, carry):
        """obs (B, obs_dim), carry = (h, c) each (B, lstm_units)."""
        x = MLP(self.units, self.activation, name="actor_mlp")(obs)
        cell = nn.OptimizedLSTMCell(self.lstm_units, name="lstm")
        (c, h), y = cell((carry[1], carry[0]), x)
        mu = nn.Dense(self.num_actions, name="mu",
                      kernel_init=nn.initializers.variance_scaling(
                          0.01, "fan_in", "truncated_normal"))(y)
        value = nn.Dense(1, name="value")(y).squeeze(-1)
        if self.fixed_sigma:
            log_sigma = self.param(
                "log_sigma", nn.initializers.constant(self.sigma_init),
                (self.num_actions,))
            log_sigma = jnp.broadcast_to(log_sigma, mu.shape)
        else:
            log_sigma = nn.Dense(self.num_actions, name="sigma")(y)
        return mu, log_sigma, value, (h, c)

    def initial_carry(self, batch: int):
        z = jnp.zeros((batch, self.lstm_units), jnp.float32)
        return (z, z)
