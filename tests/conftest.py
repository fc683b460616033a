"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

Multi-chip sharding logic (pjit/shard_map over a Mesh) is validated on
host-platform virtual devices; real-TPU execution is covered by bench.py,
the driver's `__graft_entry__` compile checks, and the release-shape smokes
(`INFINICUBE_TPU_TESTS=1 python -m pytest tests/ -m slow -q` keeps the real
TPU platform and runs tests/test_release_smoke.py on the chip).
"""

import os

_ON_CHIP = os.environ.get("INFINICUBE_TPU_TESTS") == "1"

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone is not honored when an accelerator PJRT plugin is
# present; the config update forces the CPU backend for the suite.
if not _ON_CHIP:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache: the suite is compile-bound on CPU otherwise.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
