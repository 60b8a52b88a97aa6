"""Test configuration: force JAX onto a virtual 8-device CPU platform.

This is the "fake backend" the reference never had (SURVEY.md §4): all
tests, including multi-chip sharding tests, run on CPU with
xla_force_host_platform_device_count=8 so CI needs no TPU.
"""

import os

# Force CPU even when the environment pre-sets a TPU platform (e.g.
# JAX_PLATFORMS=axon, registered by a sitecustomize that already imported
# jax — so the env var alone is too late; update jax.config directly before
# any backend is initialized).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Build the native runtime once if a toolchain is available, so the
# native-vs-numpy parity tests run (they skip gracefully otherwise).
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_so = os.path.join(_repo, "shadernn_tpu", "lib", "libsnn_runtime.so")
if not os.path.exists(_so):
    import subprocess

    try:
        subprocess.run(
            [os.path.join(_repo, "native", "build.sh")],
            timeout=120, capture_output=True, check=False,
        )
    except Exception:
        pass


@pytest.fixture
def rng():
    # Seed matches the reference's deterministic SRAND(7767517)
    # (demo/test/unittest/resnet18Test.cpp:34).
    return np.random.default_rng(7767517)


# Accuracy thresholds from the reference test harness
# (demo/common/testutil.h:1194-1195).
COMPARE_THRESHOLD_FP32 = 0.01
COMPARE_THRESHOLD_FP16 = 0.1


@pytest.fixture
def fp32_threshold():
    return COMPARE_THRESHOLD_FP32


@pytest.fixture
def fp16_threshold():
    return COMPARE_THRESHOLD_FP16
