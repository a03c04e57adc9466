"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-chip sharding tests use the virtual mesh (SURVEY.md §4: CPU with
--xla_force_host_platform_device_count=8, no TPU cluster needed for CI).
Must run before jax is imported anywhere.
"""

import os

if not os.environ.get("DETEX_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

from pathlib import Path  # noqa: E402

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The environment's sitecustomize force-registers the axon TPU platform
# via jax.config (JAX_PLATFORMS env alone is overridden), so pin the
# platform back to CPU here unless the suite is explicitly run on TPU.
if not os.environ.get("DETEX_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: repeat test runs skip recompiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/detex_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

GOLDEN_DIR = Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def golden():
    """Loader for golden npz vectors: golden('BC1') -> dict of arrays."""
    cache = {}

    def load(family: str):
        if family not in cache:
            path = GOLDEN_DIR / f"{family}.npz"
            if not path.exists():
                pytest.skip(f"golden vectors missing: {path} "
                            "(run tools/gen_goldens.py)")
            cache[family] = dict(np.load(path))
        return cache[family]

    return load
