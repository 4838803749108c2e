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
# Serving warmup pre-compiles many chunk-count buckets (production default);
# in tests one bucket keeps the code path covered without the compile bill.
os.environ.setdefault("SLICE3D_WARM_KBUCKETS", "1")

# This JAX build defaults matmuls/convs to reduced (bf16-class) precision
# even on CPU; parity tests need fp32 math.  The env var is not honored by
# this version, so set the config directly before any tracing happens.
import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
# The env vars above are not honored by this JAX build (the 'axon' TPU
# plugin registers regardless); force the CPU platform via the config API.
jax.config.update("jax_platforms", "cpu")

# Persist XLA compiles (>1 s) across test runs: the slow tier is mostly
# compile time on this 1-core host, and the cache keys on HLO hashes so
# reruns of unchanged programs start hot.
from slice3d_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
