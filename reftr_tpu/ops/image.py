"""Device-side image normalization.

Host loaders ship uint8 canvases (4x less PCIe/host->HBM traffic than f32);
the /255 + ImageNet mean/std normalization (reference transforms.py:233-263
ToTensor+Normalize) happens on-device inside the jitted step, where XLA
fuses it into the first convolution's input.
"""

from __future__ import annotations

import jax.numpy as jnp

from reftr_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD


def normalize_images(images: jnp.ndarray,
                     dtype=jnp.float32) -> jnp.ndarray:
    """[B, H, W, 3] uint8 in [0,255] -> normalized float NHWC."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype)
    std = jnp.asarray(IMAGENET_STD, dtype)
    x = images.astype(dtype) / 255.0
    return (x - mean) / std


def unnormalize_images(images) -> "np.ndarray":
    """Exact inverse of normalize_images, for qualitative dumps:
    normalized float NHWC/HWC -> uint8 in [0,255] (host-side numpy)."""
    import numpy as np

    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    x = (np.asarray(images, np.float32) * std + mean) * 255.0
    return np.clip(np.rint(x), 0, 255).astype(np.uint8)
