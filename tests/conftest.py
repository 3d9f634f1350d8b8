"""Test configuration: force CPU with 8 virtual devices so sharding logic is
testable without a TPU pod (SURVEY.md §4 implication; the driver separately
dry-runs multi-chip via __graft_entry__.dryrun_multichip)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")
