"""Wavefront path state: SoA arrays, one lane per pixel.

TPU equivalent of the reference's giant path/trace SSBOs
(/root/reference/src/integrator/basic.glsl.inc:23-59). Lanes map 1:1 to
pixels (lane = y * width + x), exactly like the reference's slot
discipline: a terminated path deposits its sample and immediately
respawns at the same pixel, so occupancy stays full and the accumulator
needs no scatter -- it is simply an (N, 3) XYZ array + (N,) sample count
reshaped to the image at resolve time.
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


def pixel_ndc(width, height, rng: Rng, flags):
    """Normalized sample positions for every lane (basic_scatter.glsl:7-21)."""
    n = width * height
    lane = jnp.arange(n, dtype=jnp.int32)
    px = (lane % width).astype(jnp.float32)
    py = (lane // width).astype(jnp.float32)
    if flags & RENDER_FLAG_SAMPLE_JITTER:
        jx = rng.uniform()
        jy = rng.uniform()
    else:
        jx = jy = 0.5
    return jnp.stack([(px + jx) / width, (py + jy) / height], axis=-1)


def new_paths(packed, camera_index, camera_model, width, height, rng: Rng, flags):
    """GenerateNewPath for every lane (basic_scatter.glsl:7-42).

    Returns (path_state dict, ray_origin, ray_direction).
    """
    n = width * height
    ndc = pixel_ndc(width, height, rng, flags)
    origin, direction = generate_camera_rays(packed, camera_index, camera_model,
                                             ndc, rng)
    state = dict(
        lambda0=rng.uniform(),
        throughput=jnp.ones((n, 4), jnp.float32),
        probability=jnp.ones((n, 4), jnp.float32),
        sample=jnp.zeros((n, 3), jnp.float32),
        active_shapes=jnp.full((n, ACTIVE_SHAPE_LIMIT), SHAPE_INDEX_NONE, jnp.int32),
    )
    return state, origin, direction


def merge_paths(old, new, respawn):
    """Select respawned lanes' state (respawn: (N,) bool)."""
    out = {}
    for key in old:
        o, n = old[key], new[key]
        mask = respawn.reshape(respawn.shape + (1,) * (o.ndim - respawn.ndim))
        out[key] = jnp.where(mask, n, o)
    return out
