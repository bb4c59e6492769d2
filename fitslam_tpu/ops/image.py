"""Dense image ops: pyramid, separable Gaussian blur, gradients.

TPU-first: everything is expressed as convolutions / reduce_windows that XLA
maps onto the MXU/VPU; no per-pixel host loops. Images are float32 ``(H, W)``
or batched ``(B, H, W)``.
"""

from __future__ import annotations

import math
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _conv2d_same(img: jax.Array, kernel: jax.Array) -> jax.Array:
    """Depthless 2D conv with SAME padding. img (..., H, W), kernel (kh, kw)."""
    batch_shape = img.shape[:-2]
    x = img.reshape((-1, 1) + img.shape[-2:])
    k = kernel[None, None].astype(img.dtype)
    out = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out.reshape(batch_shape + img.shape[-2:])


def gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def gaussian_blur(img: jax.Array, sigma: float = 2.0, radius: int = 3) -> jax.Array:
    """Separable Gaussian blur (ORB smooths before BRIEF sampling)."""
    k = jnp.asarray(gaussian_kernel1d(sigma, radius))
    img = _conv2d_same(img, k[None, :])
    img = _conv2d_same(img, k[:, None])
    return img


def downscale(img: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Area-style downscale to a fixed shape (jit-stable, shapes static)."""
    return jax.image.resize(img, img.shape[:-2] + out_hw, method="linear")


def pyramid_shapes(h: int, w: int, num_levels: int, scale_factor: float) -> List[Tuple[int, int]]:
    shapes = []
    for lvl in range(num_levels):
        s = scale_factor ** lvl
        # round to multiples of 8 to keep TPU tiling friendly
        hh = max(32, int(math.floor(h / s / 8)) * 8)
        ww = max(32, int(math.floor(w / s / 8)) * 8)
        shapes.append((hh, ww))
    return shapes


def build_pyramid(img: jax.Array, num_levels: int, scale_factor: float) -> List[jax.Array]:
    """List of per-level images; level 0 is the input. Static-shape per level."""
    h, w = img.shape[-2:]
    shapes = pyramid_shapes(h, w, num_levels, scale_factor)
    levels = [img]
    for lvl in range(1, num_levels):
        levels.append(downscale(levels[-1], shapes[lvl]))
    return levels


def sobel_gradients(img: jax.Array) -> Tuple[jax.Array, jax.Array]:
    kx = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32) / 8.0
    ky = kx.T
    return _conv2d_same(img, kx), _conv2d_same(img, ky)
