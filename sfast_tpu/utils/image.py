"""Latent/image postprocessing — the analog of the reference's jitted
VaeImageProcessor patch (``libs/diffusers/image_processor.py:13-108``),
whose point is one host sync at the very end of the pipeline.

Here the [-1,1]→uint8 conversion happens on-device inside the decode
executable; only the final uint8 tensor crosses to host.
"""

from typing import List

import jax.numpy as jnp
import numpy as np


def denormalize_to_uint8(image: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,3) in [-1,1] → uint8, on device."""
    img = jnp.clip(image.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
    return jnp.round(img * 255.0).astype(jnp.uint8)


def to_numpy(image) -> np.ndarray:
    return np.asarray(image)


def to_pil(image) -> List:
    """uint8 (B,H,W,3) → list of PIL images (PIL optional)."""
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover
        raise ImportError("Pillow is required for PIL output") from e
    arr = np.asarray(image)
    return [Image.fromarray(a) for a in arr]


def preprocess_control_image_u8(img, dtype=jnp.float32):
    """Control image → ``(device_array, is_u8)`` for the fused-pipeline
    path: uint8 inputs (the common case — canny/pose hints are
    uint8-born) cross the host→device link RAW and are [0,1]-normalized
    inside the executable, 4x fewer bytes than a float upload (768 KB vs
    3 MB for a 512² hint — material through a ~22 MB/s tunnel).  Float
    inputs fall back to the standard normalize-on-host path."""
    if not isinstance(img, np.ndarray):
        if isinstance(img, (list, tuple)):
            img = np.stack([np.asarray(i) for i in img])
        else:
            img = np.asarray(img)
            if img.ndim == 3:
                img = img[None]
    if img.dtype == np.uint8:
        return jnp.asarray(img), True
    return jnp.asarray(img, dtype), False


def preprocess_control_image(img, dtype=jnp.float32) -> jnp.ndarray:
    """Control/conditioning images are [0,1]-ranged (diffusers ControlNet
    convention), unlike VAE inputs which are [-1,1]."""
    if not isinstance(img, np.ndarray):
        if isinstance(img, (list, tuple)):
            img = np.stack([np.asarray(i) for i in img])
        else:
            img = np.asarray(img)
            if img.ndim == 3:
                img = img[None]
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    return jnp.asarray(img, dtype)


def preprocess_image(img, dtype=jnp.float32) -> jnp.ndarray:
    """PIL image / uint8 array (B,H,W,3) → (B,H,W,3) float in [-1,1]."""
    if not isinstance(img, np.ndarray):
        if isinstance(img, (list, tuple)):
            img = np.stack([np.asarray(i) for i in img])
        else:
            img = np.asarray(img)
            if img.ndim == 3:
                img = img[None]
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 127.5 - 1.0
    return jnp.asarray(img, dtype)
