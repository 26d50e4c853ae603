"""Perf-floor breakdown for the slow tier (VERDICT r3 weak #5).

Times the full env step and then ablations that isolate the cost centers:
HumanoidAMP (0.206M steps/s) and AnymalTerrain (0.237M) vs Humanoid (1.08M).

Ablations (config-only, no code changes):
* substeps/controlFrequencyInv halved — is the cost linear in sim ticks?
* AnymalTerrain: flat-terrain (curriculum off, numLevels 1) — terrain gather
  cost; reuse_mass_matrix on — the decimation-fold opt-out's price
* HumanoidAMP: controlFrequencyInv 1 — decimation cost split

Usage: python scripts/profile_floor.py [task ...]
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench(name, num_envs, iters, extra):
    from isaacgymenvs_ma_tpu.tasks import registry
    from isaacgymenvs_ma_tpu.utils.config import deep_merge
    cfg = deep_merge(deep_merge(registry.task_default_config(name),
                                {"env": {"numEnvs": num_envs}}), extra)
    task = registry.create_task(name, cfg)
    W = jax.random.normal(jax.random.PRNGKey(0),
                          (task.num_obs, task.num_actions)) * 0.1

    def body(carry, _):
        st, obs = carry
        act = jnp.tanh(obs[: task.num_envs, : task.num_obs] @ W)
        st, res = task.step(st, act)
        return (st, res.obs), None

    @jax.jit
    def run(st, obs):
        (st, obs), _ = jax.lax.scan(body, (st, obs), None, length=iters)
        return st, obs

    st = task.initial_state(jax.random.PRNGKey(1))
    obs = jnp.zeros((task.rl_games_batch, task.num_obs))
    st, obs = run(st, obs)          # compile + warm
    jax.block_until_ready(obs)
    t0 = time.time()
    st, obs = run(st, obs)
    jax.block_until_ready(obs)
    dtime = time.time() - t0
    sps = num_envs * iters / dtime
    ms = dtime / iters * 1000
    return sps, ms


CASES = {
    "HumanoidAMP": [
        ("baseline", {}),
        ("cfi=1 (2 sim ticks -> 1 per policy step)",
         {"env": {"controlFrequencyInv": 1}}),
        ("substeps=1", {"sim": {"substeps": 1}}),
        ("mm_reuse off", {"sim": {"physx": {"reuse_mass_matrix": False}}}),
    ],
    "AnymalTerrain": [
        ("baseline", {}),
        ("mm_reuse ON (stale-inertia folding)",
         {"sim": {"physx": {"reuse_mass_matrix": True}}}),
        ("flat terrain (1 level, curriculum off)",
         {"env": {"terrain": {"numLevels": 1, "curriculum": False}}}),
        ("substeps=2 (half the folded decimation)",
         {"sim": {"substeps": 2}}),
    ],
    "Humanoid": [("reference point", {})],
}

N = {"HumanoidAMP": 4096, "AnymalTerrain": 4096, "Humanoid": 4096}
IT = {"HumanoidAMP": 50, "AnymalTerrain": 50, "Humanoid": 100}


def main():
    names = sys.argv[1:] or list(CASES)
    for name in names:
        for label, extra in CASES[name]:
            try:
                sps, ms = bench(name, N[name], IT[name], extra)
                print(f"{name:14s} | {label:42s} | "
                      f"{sps/1e6:6.3f}M steps/s | {ms:7.2f} ms/step",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name:14s} | {label:42s} | FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
