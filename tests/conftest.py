"""Test configuration.

Tests run on a virtual 8-device CPU mesh (multi-chip sharding is validated
without TPU hardware; the driver separately dry-runs the real multi-chip
path via __graft_entry__.dryrun_multichip).  This mirrors the reference's
trick of using CPU OpenCL platforms as the no-GPU test backend
(opencl_devinfo.c:1066-1096, pg_strom.opencl_device_types=cpu).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

# The axon TPU plugin force-sets jax_platforms="axon,cpu" and ignores the
# JAX_PLATFORMS env var; selecting cpu through jax.config is what sticks.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", jax.devices()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20140601)  # reference v0 era


import pytest


@pytest.fixture(scope="session", autouse=True)
def _force_offload_for_determinism():
    """The regression contract is forced-offload determinism: the reference
    runs pg_regress with pg_strom.debug_force_gpupreagg=on (input/enable.conf)
    because test fixtures are far below the cost model's offload breakeven.
    Same trick here: the suite forces the device plan so every test exercises
    the TPU path; cost-model tests override this back off explicitly."""
    from pg_strom_tpu.config import set_config
    set_config("debug_force_offload", True)
    yield


@pytest.fixture(scope="module", autouse=True)
def _fresh_xla_compiler_state():
    """Clear jit caches at each test module: the XLA CPU compiler crashes
    (SIGABRT inside backend_compile, latent jaxlib bug) once a process
    accumulates >~1000 compiled programs — the MXU strategy variants pushed
    the full suite past that line.  Per-module recompiles are cheap on CPU
    and keep every module hermetic."""
    jax.clear_caches()
    yield
