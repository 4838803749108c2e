"""Test configuration: run everything on a virtual 8-device CPU mesh.

TPU hardware in CI is a single chip; multi-device sharding logic is
validated against XLA's host-platform device emulation instead.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
