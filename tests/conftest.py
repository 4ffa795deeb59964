"""Test bootstrap: repo on sys.path, JAX pinned to a virtual 8-device CPU mesh.

Unit tests never need real TPU hardware; multi-chip sharding tests run against
``--xla_force_host_platform_device_count=8`` (see SURVEY.md §4 test strategy).
The env vars must be set before the first ``import jax`` anywhere in the test
process, which is why they live here rather than in a fixture.
"""

import os
import sys

# Force CPU even though the image exports JAX_PLATFORMS=axon (TPU tunnel):
# unit tests must be hermetic and fast. The image's sitecustomize imports jax
# at interpreter start, so env vars alone are too late — use config.update,
# which works because no backend has been initialized yet at conftest time.
# STT_TEST_PLATFORM overrides for on-device test sessions.
_platform = os.environ.get("STT_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Isolate the serve-executable disk cache per test session (never write a
# test engine's executables into the operator's ~/.cache).
if "STT_EXEC_CACHE_DIR" not in os.environ:
    import tempfile

    os.environ["STT_EXEC_CACHE_DIR"] = tempfile.mkdtemp(prefix="stt_exec_")
