"""Test harness config: force the CPU backend (with an 8-device virtual mesh
for sharding tests) so the suite runs identically with or without TPU
hardware attached."""
import os

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import pytest

REF_IMAGES = "/root/reference/onnxocr/test_images"


@pytest.fixture(scope="session")
def cls_onnx_path():
    from onnxocr_tpu import config as cfg
    path = cfg.find_asset("ppocrv5/cls/cls.onnx")
    if not os.path.exists(path):
        pytest.skip("cls.onnx asset not available")
    return path


@pytest.fixture(scope="session")
def test_image():
    import cv2
    path = os.path.join(REF_IMAGES, "1.jpg")
    if not os.path.exists(path):
        pytest.skip("reference test image not available")
    return cv2.imread(path)
