"""Wavefront path state: channels-first SoA arrays, one lane per pixel.

TPU equivalent of the reference's giant path/trace SSBOs
(/root/reference/src/integrator/basic.glsl.inc:23-59). Lanes map 1:1 to
pixels (lane = y * width + x), exactly like the reference's slot
discipline: a terminated path deposits its sample and immediately
respawns at the same pixel, so occupancy stays full and the accumulator
needs no scatter -- it is simply a (3, N) XYZ array + (N,) sample count
reshaped to the image at resolve time. All state is channels-first so
the lane axis rides the TPU's 128-wide minor dimension.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.constants import (
    ACTIVE_SHAPE_LIMIT,
    RENDER_FLAG_SAMPLE_JITTER,
    SHAPE_INDEX_NONE,
)
from ..core.sampling import Rng
from ..ops.camera import generate_camera_rays


# Packet tile shape for the lane->pixel swizzle: a 32x8 pixel tile per
# 256 lanes makes the Pallas packet kernel's 1024-ray packets cover a
# compact 128x8 screen strip instead of a full scanline, cutting shared
# BVH traversal work ~6x (measured on the viking-hall scene).
TILE_W = 32
TILE_H = 8


def use_tile_swizzle(width, height):
    return width % TILE_W == 0 and height % TILE_H == 0


def lane_to_pixel(lane, width, height):
    """Map lane index -> (px, py) with tile swizzling when divisible."""
    if use_tile_swizzle(width, height):
        tile = TILE_W * TILE_H
        tiles_x = width // TILE_W
        t = lane // tile
        w = lane % tile
        px = (t % tiles_x) * TILE_W + w % TILE_W
        py = (t // tiles_x) * TILE_H + w // TILE_W
        return px, py
    return lane % width, lane // width


def pixel_to_lane_permutation(width, height):
    """Host-side (H*W,) numpy array: lane index of each raster pixel."""
    import numpy as np

    lane = np.arange(width * height)
    if not use_tile_swizzle(width, height):
        return lane
    tile = TILE_W * TILE_H
    tiles_x = width // TILE_W
    t = lane // tile
    w = lane % tile
    px = (t % tiles_x) * TILE_W + w % TILE_W
    py = (t // tiles_x) * TILE_H + w // TILE_W
    inverse = np.empty(width * height, np.int64)
    inverse[py * width + px] = lane
    return inverse


def pixel_ndc(width, height, rng: Rng, flags, lane=None):
    """Normalized sample positions (2, N) (basic_scatter.glsl:7-21).

    `lane` is the global lane index; defaults to the full image. Lanes
    map to pixels through the tile swizzle (see lane_to_pixel).
    """
    if lane is None:
        lane = jnp.arange(width * height, dtype=jnp.int32)
    pxi, pyi = lane_to_pixel(lane, width, height)
    px = pxi.astype(jnp.float32)
    py = pyi.astype(jnp.float32)
    if flags & RENDER_FLAG_SAMPLE_JITTER:
        jx = rng.uniform()
        jy = rng.uniform()
    else:
        jx = jy = 0.5
    return jnp.stack([(px + jx) / width, (py + jy) / height], axis=0)


def new_paths(packed, camera_index, camera_model, width, height, rng: Rng,
              flags, lane=None):
    """GenerateNewPath for every lane (basic_scatter.glsl:7-42).

    Returns (path_state dict, ray_origin (3, N), ray_direction (3, N)).
    """
    n = width * height if lane is None else lane.shape[0]
    ndc = pixel_ndc(width, height, rng, flags, lane)
    origin, direction = generate_camera_rays(packed, camera_index, camera_model,
                                             ndc, rng)
    state = dict(
        lambda0=rng.uniform(),
        throughput=jnp.ones((4, n), jnp.float32),
        probability=jnp.ones((4, n), jnp.float32),
        sample=jnp.zeros((3, n), jnp.float32),
        active_shapes=jnp.full((ACTIVE_SHAPE_LIMIT, n), SHAPE_INDEX_NONE, jnp.int32),
    )
    return state, origin, direction


def merge_paths(old, new, respawn):
    """Select respawned lanes' state (respawn: (N,) bool broadcasts over
    leading channel axes)."""
    return {key: jnp.where(respawn, new[key], old[key]) for key in old}
