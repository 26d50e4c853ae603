"""Test harness config: run on a virtual 8-device CPU mesh.

Multi-host sharding is validated without real chips by forcing the host
platform to expose 8 virtual devices (the driver's ``dryrun_multichip`` does
the same).  The interpreter may have been booted with a TPU PJRT plugin
pre-registered (sitecustomize), so we must override the platform via
jax.config *after* import, not just env vars.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
