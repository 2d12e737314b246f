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


def preprocess_mask_image(mask, lh: int, lw: int) -> jnp.ndarray:
    """Inpainting mask → KEEP mask at latent resolution, (B, lh, lw, 1)
    float32 on device.

    Input follows the diffusers convention (white = repaint, black =
    preserve; ``StableDiffusionInpaintPipeline`` docstring — the
    reference compiles that pipeline transparently, README.md:371
    "Image Inpainting: Yes").  Accepts PIL, (H,W), (H,W,C), or
    (B,H,W[,C]) uint8/float arrays; any channel marked counts as
    repaint.  Nearest-sampled down to the latent grid, binarized at
    0.5, then INVERTED so a value of 1 preserves the original content —
    the orientation the per-step blend consumes."""
    arr = np.asarray(mask)
    if arr.ndim == 2:
        arr = arr[None, :, :, None]
    elif arr.ndim == 3:
        if arr.shape[-1] in (1, 3, 4):  # (H,W,C)
            arr = arr[None]
        else:  # (B,H,W)
            arr = arr[..., None]
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    else:
        arr = arr.astype(np.float32)
    if arr.shape[-1] == 4:
        # RGBA: alpha is opacity, NOT repaint signal — an opaque
        # (alpha=255) black-and-white mask PNG would otherwise max() to
        # all-ones and silently repaint everything (degrading inpaint to
        # plain img2img).  Drop alpha; diffusers likewise converts the
        # mask to grayscale ("L") before thresholding.
        arr = arr[..., :3]
    arr = arr.max(axis=-1, keepdims=True)
    b, h, w, _ = arr.shape
    ys = (np.arange(lh) * h) // lh
    xs = (np.arange(lw) * w) // lw
    inpaint = (arr[:, ys][:, :, xs] >= 0.5).astype(np.float32)
    return jnp.asarray(1.0 - inpaint)


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
