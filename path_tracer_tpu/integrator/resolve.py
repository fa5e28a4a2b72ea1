"""Resolve pass: accumulator -> tone-mapped sRGB image.

Pure-jnp equivalent of /root/reference/src/integrator/resolve.glsl:
divide XYZ by sample count, apply brightness, convert to linear sRGB,
tone map (Clamp / Reinhard-extended / Hable / ACES).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.spectrum import xyz_to_srgb
from ..core.tonemap import tonemap


@partial(jax.jit, static_argnames=('width', 'height', 'mode'))
def resolve(accum, width, height, brightness=1.0, mode=0, white_level=1.0):
    """Resolve the (3, N)+(N,) accumulator into an (H, W, 3) image.

    Lanes are tile-swizzled (integrator/state.py lane_to_pixel); the
    inverse permutation is applied here, once per resolve.
    """
    from .state import pixel_to_lane_permutation, use_tile_swizzle

    xyz = accum['xyz']
    count = accum['count']
    color = xyz_to_srgb(xyz * (jnp.asarray(brightness, jnp.float32)
                               / jnp.maximum(count, 1.0)))
    color = jnp.where(count > 0, color, 0.0)
    color = tonemap(color, mode, white_level)
    # The reference writes to a UNORM swapchain image, which clamps to
    # [0, 1] in hardware; ACES/Hable can emit slight out-of-range values.
    color = jnp.clip(color, 0.0, 1.0)
    if use_tile_swizzle(width, height):
        perm = jnp.asarray(pixel_to_lane_permutation(width, height))
        color = color[:, perm]
    return jnp.moveaxis(color.reshape(3, height, width), 0, -1)
