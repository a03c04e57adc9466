"""Root conftest: makes the repo root importable and forces the CPU
platform with 8 virtual devices before any test imports jax
(SURVEY.md §4 multi-host testing strategy)."""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

# Force CPU for tests even when the ambient environment selects a TPU
# platform; set DETEX_TEST_TPU=1 to run the suite on real hardware.
if not os.environ.get("DETEX_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
