"""Test configuration: force JAX onto a virtual 8-device CPU mesh so the
full sharding path runs hostless (SURVEY.md §4)."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize force-selects jax_platforms="axon,cpu" at
# interpreter start; override back to CPU before any backend initializes
# so tests run hostless and fast (SURVEY.md §4).
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except ImportError:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
REFERENCE_TEST = "/root/reference/test"


def fixture_path(name: str) -> str:
    for base in (FIXTURES, REFERENCE_TEST):
        p = os.path.join(base, name)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(name)
