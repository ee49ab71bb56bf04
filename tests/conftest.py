"""Test configuration.

Tests run on a virtual 8-device CPU backend so that sharding logic is
exercised without TPU hardware (SURVEY.md §4). Set RUN_ON_TPU=1 to run the
suite against the real chip instead.
"""

import os

if not os.environ.get("RUN_ON_TPU"):
    # Overwrite, not setdefault: the environment presets JAX_PLATFORMS=axon
    # (the TPU tunnel), and its sitecustomize force-sets the jax config to
    # "axon,cpu" — which would silently run "CPU" tests on the real chip.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
