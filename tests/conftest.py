import os
import sys

# force CPU + a virtual 8-device mesh for sharding tests BEFORE jax import
# (the session shell may export JAX_PLATFORMS=axon for the tunneled TPU;
# tests must be deterministic on CPU unless explicitly requested)
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not os.environ.get("MM2TPU_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    # the axon sitecustomize hook overrides JAX_PLATFORMS programmatically
    # and a stalled tunnel then hangs every backend init — unregister it
    # so the suite completes (with skips) even during an outage
    from mm2_gb_tpu.utils.tunnel import force_cpu
    force_cpu()

import pytest  # noqa: E402

# Persistent XLA compile cache for the suite: the interpret-mode Pallas
# compiles (slow-marked kernel tests) are paid once per host
from mm2_gb_tpu.utils.tpucfg import enable_compile_cache  # noqa: E402
enable_compile_cache()

REF_TEST_DIR = "/root/reference/test"


def pytest_collection_modifyitems(config, items):
    if os.environ.get("MM2TPU_RUN_SLOW"):
        return
    skip_slow = pytest.mark.skip(
        reason="slow interpret-mode kernel compile; set MM2TPU_RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


@pytest.fixture(scope="session")
def ref_test_dir():
    if not os.path.isdir(REF_TEST_DIR):
        pytest.skip("reference test data not available")
    return REF_TEST_DIR


def golden_path(name: str) -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "golden", name)
