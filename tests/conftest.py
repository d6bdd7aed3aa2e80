import os
import sys

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised in CI without TPU hardware (SURVEY.md section 4).  NOTE: in this
# environment the JAX_PLATFORMS env var is ignored by the axon plugin; the
# config API works, so force the platform through it before any device use.
#
# TPU hardware lane: SURF_TPU_TESTS=1 leaves the real backend in place so
# the Pallas kernels run on the chip (not the interpreter / gather path).
# Canonical command (one golden + one oracle-parity run on hardware):
#   SURF_TPU_TESTS=1 python -m pytest tests/test_golden_fixture.py \
#       tests/test_reference_oracle.py -q -m "not cpu_only"
_TPU_LANE = os.environ.get("SURF_TPU_TESTS") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if not _TPU_LANE and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

import jax

if not _TPU_LANE:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "cpu_only: skip under the SURF_TPU_TESTS hardware lane")
    config.addinivalue_line(
        "markers", "slow: full-resolution / multi-minute test, skipped "
        "unless SURF_FULL_TESTS=1 (the quick suite must stay under ~10 "
        "minutes so it actually gets run before commits)")


def pytest_collection_modifyitems(config, items):
    # slow tests always run on the TPU hardware lane (they are fast
    # there: the full-res golden is ~14 s on-chip vs tens of minutes
    # under the CPU interpreter)
    if os.environ.get("SURF_FULL_TESTS") != "1" and not _TPU_LANE:
        skip_slow = pytest.mark.skip(
            reason="slow test; set SURF_FULL_TESTS=1 for the full suite")
        for item in items:
            if "slow" in item.keywords:
                item.add_marker(skip_slow)
    if not _TPU_LANE:
        return
    skip = pytest.mark.skip(reason="cpu_only test under SURF_TPU_TESTS=1")
    for item in items:
        if "cpu_only" in item.keywords:
            item.add_marker(skip)


# Kernel-mode helpers: Pallas-kernel tests run Mosaic-compiled on the
# chip under SURF_TPU_TESTS=1 (catching miscompiles/VMEM regressions in
# the real kernels) and under the interpreter on CPU.
KERNEL_INTERPRET = not _TPU_LANE


def kernel_wavelet_method() -> str:
    return "pallas" if _TPU_LANE else "interpret"


def kernel_detect_backend() -> str:
    return "fused" if _TPU_LANE else "fused_interpret"


REFERENCE_DATA = "/root/reference/data"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def small_image(rng):
    """Smooth synthetic test image with blob structure at several scales."""
    h, w = 120, 160
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = 96 + 40 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
    for (cy, cx, s, a) in [(30, 40, 4, 90), (70, 110, 8, -70), (90, 30, 6, 80),
                           (40, 130, 5, -60), (100, 90, 10, 70)]:
        img += a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
    img += rng.normal(0, 2.0, (h, w))
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.fixture(scope="session")
def left_image():
    from cuda_surf_tpu.io import read_pgm
    return read_pgm(os.path.join(REFERENCE_DATA, "left.pgm"))


@pytest.fixture(scope="session")
def right_image():
    from cuda_surf_tpu.io import read_pgm
    return read_pgm(os.path.join(REFERENCE_DATA, "right.pgm"))
