"""Headline benchmark: Ant env-steps/s on one chip @ 4096 envs.

Measures the full environment hot path (physics substeps + contact solve +
observation/reward kernels + masked auto-reset) under one jit, driven by a
cheap deterministic pseudo-policy so the actions depend on the observations
(prevents the compiler from hoisting anything).  Matches the reference's
canonical throughput configuration (Ant, 4096 envs, dt=1/60, 2 substeps —
cfg/task/Ant.yaml).  Prints ONE JSON line; ``vs_baseline`` is the ratio to the
1M env-steps/s/chip north-star (BASELINE.md).
"""
import json
import time

import jax
import jax.numpy as jnp


def main():
    num_envs = 4096
    steps_per_iter = 200
    from isaacgymenvs_ma_tpu.tasks.ant import Ant, TASK_CFG
    from isaacgymenvs_ma_tpu.utils.config import deep_merge

    task = Ant(deep_merge(TASK_CFG, {"env": {"numEnvs": num_envs}}))

    # fixed random projection: actions = tanh(obs @ W) — negligible cost,
    # keeps the loop data-dependent.
    key = jax.random.PRNGKey(0)
    W = jax.random.normal(key, (task.num_obs, task.num_actions)) * 0.1

    @jax.jit
    def run(state):
        def body(carry, _):
            state, obs = carry
            actions = jnp.tanh(obs @ W)
            state, res = task.step(state, actions)
            return (state, res.obs), None
        (state, obs), _ = jax.lax.scan(
            body, (state, jnp.zeros((num_envs, task.num_obs))), None,
            length=steps_per_iter)
        return state, obs

    state = task.initial_state(jax.random.PRNGKey(1))
    # compile + warmup
    state, obs = run(state)
    jax.block_until_ready(obs)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        state, obs = run(state)
    jax.block_until_ready(obs)
    dt = time.perf_counter() - t0

    steps_per_s = num_envs * steps_per_iter * iters / dt
    print(json.dumps({
        "metric": "ant_env_steps_per_s_per_chip",
        "value": round(steps_per_s),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_s / 1_000_000, 4),
    }))


if __name__ == "__main__":
    main()
