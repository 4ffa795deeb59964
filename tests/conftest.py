"""Test bootstrap: repo on sys.path, JAX pinned to a virtual 8-device CPU mesh.

Unit tests never need real TPU hardware; multi-chip sharding tests run against
``--xla_force_host_platform_device_count=8`` (see SURVEY.md §4 test strategy).
The env vars must be set before the first ``import jax`` anywhere in the test
process, which is why they live here rather than in a fixture.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
