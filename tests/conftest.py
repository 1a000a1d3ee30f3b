"""Test config: force an 8-device virtual CPU platform.

Tests never touch the real TPU — multi-chip sharding is validated on a
virtual 8-device CPU mesh, numerics against torch-CPU oracles.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize pins JAX_PLATFORMS=axon at interpreter startup; the
# env var alone does not stick, so force the platform through the config API
# before any backend is initialized.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"

REFERENCE_ROOT = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "models"))


@pytest.fixture(scope="session")
def reference_path():
    """Put the reference repo on sys.path for golden-oracle parity tests.

    The upstream torch implementation is used purely as a numerical oracle;
    tests that rely on it are skipped when it isn't mounted. Some reference
    modules import cv2/PIL/torchvision at import time; they are present in
    this image, but tools.py also expects CUDA-optional paths that work on
    CPU, so a plain import suffices.
    """
    if not has_reference():
        pytest.skip("reference repo not mounted")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    # torchvision isn't installed; the reference only uses it for a debug
    # text-overlay helper, so a stub is enough for import.
    if "torchvision" not in sys.modules:
        import types

        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
    return REFERENCE_ROOT


@pytest.fixture(autouse=True)
def _torch_full_precision():
    """The reference's softsplat_torch import side-effect lowers torch matmul
    precision globally (softsplat_torch.py:13); undo it so oracle outputs
    stay full-precision regardless of test order."""
    try:
        import torch

        torch.set_float32_matmul_precision("highest")
    except ImportError:
        pass
    yield
