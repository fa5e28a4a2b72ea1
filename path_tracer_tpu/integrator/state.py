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


def pixel_ndc(width, height, rng: Rng, flags, lane=None):
    """Normalized sample positions (2, N) (basic_scatter.glsl:7-21).

    `lane` is the global lane->pixel index array; defaults to the full
    image. Sharded renderers pass their device's lane slice.
    """
    if lane is None:
        lane = jnp.arange(width * height, dtype=jnp.int32)
    px = (lane % width).astype(jnp.float32)
    py = (lane // width).astype(jnp.float32)
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
