"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Sharding tests need multiple devices; real TPU hardware is exercised by
bench.py / the driver, not by the unit suite.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib  # noqa: E402

import pytest  # noqa: E402

from paffy_tpu.jaxconf import ensure_jax  # noqa: E402

ensure_jax()   # x64 + platform config (lazy since the -S launcher work)

import jax  # noqa: E402

# The axon TPU plugin registers itself even when JAX_PLATFORMS=cpu is set and
# would make every test compile remotely on the TPU tunnel (~20-60s per
# compile).  Pin the default device to host CPU for the unit suite; real-TPU
# execution is exercised by bench.py / the driver.
try:
    jax.config.update("jax_default_device", jax.local_devices(backend="cpu")[0])
except RuntimeError:  # no cpu backend — leave defaults
    pass

GOLDEN_PAF = pathlib.Path("/root/reference/tests/human_chimp.paf")


@pytest.fixture(scope="session")
def golden_paf_path():
    if not GOLDEN_PAF.exists():
        pytest.skip("golden human_chimp.paf not available")
    return GOLDEN_PAF
