"""Host-side image transforms: decode, resize, ImageNet-normalize -> NHWC f32.

Matches reference preprocessing (train_VIGOR.py:57-70): torchvision
Resize (PIL bilinear) + ToTensor + Normalize(imagenet mean/std). GT map
rendering is NOT done here - it happens on-device from scalars
(ccvpe_tpu/ops/gt.py)."""

from __future__ import annotations

import logging
from typing import Tuple

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

logger = logging.getLogger("ccvpe_tpu.data")


def open_rgb(path: str, fallback_wh: Tuple[int, int]):
    """PIL open -> RGB with blank-image degradation on unreadable files
    (reference datasets.py:100-105): one corrupt JPEG in a 100k-sample epoch
    must not abort a multi-hour run. Logs a warning so the corruption is
    visible."""
    import PIL.Image
    try:
        return PIL.Image.open(path).convert("RGB")
    except Exception as e:  # noqa: BLE001 - any decode failure degrades
        logger.warning("unreadable image %s (%s); substituting blank",
                       path, e)
        return PIL.Image.new("RGB", fallback_wh)


def resize_pil(img, size_hw: Tuple[int, int]):
    """PIL bilinear resize to (H, W) - torchvision Resize semantics on PIL
    input (train_VIGOR.py:58,66)."""
    import PIL.Image
    h, w = size_hw
    if img.size != (w, h):
        img = img.resize((w, h), PIL.Image.BILINEAR)
    return img


def normalize(img) -> np.ndarray:
    """PIL/uint8 HWC -> float32 HWC, ImageNet-normalized."""
    x = np.asarray(img, np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def finalize(img, dtype: str = "float32") -> np.ndarray:
    """Resized PIL image -> uint8 raw pixels (for on-device normalization,
    train/step.py::device_normalize) or host-normalized float32."""
    if dtype == "uint8":
        return np.asarray(img, np.uint8)
    return normalize(img)


def load_image(path: str, size_hw: Tuple[int, int], fallback_hw=None,
               dtype: str = "float32") -> np.ndarray:
    """Open -> RGB -> resize -> normalize. Unreadable files yield a blank
    image (reference datasets.py:100-105).

    dtype="uint8" skips normalization and returns resized uint8 pixels (the
    "ship uint8, normalize on device" ingest path: 4x less host->device
    traffic; normalization happens inside the jitted step, train/step.py).
    This also matches the reference preprocessing order exactly - PIL
    resizes in uint8 BEFORE ToTensor/Normalize (train_VIGOR.py:57-70).

    Uses the native C++ decode/resize library (native/io.cc, ~2.5x faster
    than PIL per image on this host) when built; PIL otherwise. Disable with
    CCVPE_NATIVE_IO=0.
    """
    import os
    if os.environ.get("CCVPE_NATIVE_IO", "1") != "0":
        from ccvpe_tpu.data import native_io
        out = (native_io.load_image_raw_native(path, size_hw)
               if dtype == "uint8"
               else native_io.load_image_native(path, size_hw))
        if out is not None:
            return out
    h, w = fallback_hw or size_hw
    img = open_rgb(path, (w, h))
    img = resize_pil(img, size_hw)
    if dtype == "uint8":
        return np.asarray(img, np.uint8)
    return normalize(img)
