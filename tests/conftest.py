"""Test configuration: run JAX on CPU with 8 simulated devices.

Multi-chip sharding tests use an 8-device CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), per the reference
rebuild test strategy (SURVEY.md §4).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


def _torch_available():
    try:
        import torch  # noqa: F401

        return True
    except Exception:
        return False


requires_torch = pytest.mark.skipif(
    not _torch_available(), reason="torch not available for parity tests"
)

REFERENCE_DIR = "/root/reference"


def reference_available():
    return os.path.isdir(os.path.join(REFERENCE_DIR, "multimae"))


requires_reference = pytest.mark.skipif(
    not (reference_available() and _torch_available()),
    reason="reference repo or torch unavailable",
)
