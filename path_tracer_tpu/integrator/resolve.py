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
def resolve(accum, width, height, brightness=1.0, mode=0, white_level=1.0,
            lane=None):
    """Resolve the (3, N)+(N,) accumulator into an (H, W, 3) image.

    `lane` is each slot's pixel-lane id; when omitted, slots are
    assumed in lane order -- which the render state now always is: the
    coherence sort lives inside ops.intersect.trace and permutes only
    kernel inputs/outputs, never the state (the pre-a5b5f48 design
    co-sorted the whole state each round, and resolving such a state
    WITHOUT its lane map silently scrambled pixel placement -- the
    round-3 bench-golden bug). Lanes map to pixels through the tile
    swizzle (integrator/state.py), inverted here once per resolve.

    Multiple slots may share a pixel lane (RenderConfig.waves > 1, or a
    batch-merged accumulator): XYZ and counts are scatter-ADDED per
    pixel before the divide, so the fold is the exact Monte-Carlo
    estimator over all of a pixel's slots. With one slot per pixel this
    reduces bitwise to the old set-then-divide (x + 0 == x in f32).
    """
    from .state import lane_to_pixel

    xyz = accum['xyz']
    count = accum['count']
    n = xyz.shape[1]
    if lane is None:
        lane = jnp.arange(n, dtype=jnp.int32) % jnp.int32(width * height)
    px, py = lane_to_pixel(lane, width, height)
    flat = py * width + px
    pix_xyz = jnp.zeros((3, width * height), jnp.float32).at[:, flat].add(xyz)
    pix_count = jnp.zeros((width * height,), jnp.float32).at[flat].add(count)
    color = xyz_to_srgb(pix_xyz * (jnp.asarray(brightness, jnp.float32)
                                   / jnp.maximum(pix_count, 1.0)))
    color = jnp.where(pix_count > 0, color, 0.0)
    color = tonemap(color, mode, white_level)
    # The reference writes to a UNORM swapchain image, which clamps to
    # [0, 1] in hardware; ACES/Hable can emit slight out-of-range values.
    color = jnp.clip(color, 0.0, 1.0)
    return jnp.moveaxis(color.reshape(3, height, width), 0, -1)
