"""Test configuration: force CPU with 8 virtual devices so sharding logic is
testable without a TPU pod (SURVEY.md §4 implication; the driver separately
dry-runs multi-chip via __graft_entry__.dryrun_multichip).

NOTE: the axon sitecustomize registers the tunneled TPU backend and
overrides the JAX_PLATFORMS env var, so forcing CPU requires
jax.config.update AFTER importing jax — env vars alone are ignored."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags
                               + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
