"""Camera ray generation: pinhole, thin-lens, 360 spherical.

Vectorized equivalent of GenerateCameraRay
(/root/reference/src/scene/scene.glsl.inc:613-655). Channels-first:
rays are (3, N). The camera model is selected statically per render
config (one camera renders at a time, as in the reference), so there is
no per-lane dispatch.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.constants import (
    CAMERA_MODEL_360,
    CAMERA_MODEL_PINHOLE,
    CAMERA_MODEL_THIN_LENS,
    PI,
    TAU,
)
from ..core.sampling import Rng, random_point_on_disk
from ..core.vec import normalize, transform_vector, vec3


def generate_camera_rays(packed, camera_index: int, camera_model: int,
                         ndc, rng: Rng):
    """Generate world-space camera rays for normalized sample positions.

    ndc: (2, N) normalized sample positions in [0, 1]^2.
    camera_index/camera_model are static ints (the active render camera).
    Returns (origin (3, N), direction (3, N)) with unit direction.
    """
    sensor_size = packed.camera_sensor_size[camera_index]
    sensor_distance = packed.camera_sensor_distance[camera_index]
    aperture = packed.camera_aperture_radius[camera_index]
    focal = packed.camera_focal_length[camera_index]
    world = packed.camera_world_from_camera[camera_index]

    n = ndc.shape[1]
    zeros = jnp.zeros(n)

    if camera_model in (CAMERA_MODEL_PINHOLE, CAMERA_MODEL_THIN_LENS):
        sensor_pos = vec3(
            -sensor_size[0] * (ndc[0] - 0.5),
            -sensor_size[1] * (0.5 - ndc[1]),
            jnp.broadcast_to(sensor_distance, (n,)),
        )
        disk = random_point_on_disk(rng) * aperture
        origin = vec3(disk[0], disk[1], zeros)
        if camera_model == CAMERA_MODEL_PINHOLE:
            direction = normalize(origin - sensor_pos)
        else:
            # Thin lens: aim at the in-focus object point conjugate to the
            # sensor position (scene.glsl.inc:640-643).
            object_pos = -sensor_pos * (focal / (sensor_pos[2] - focal))
            direction = normalize(object_pos - origin)
    elif camera_model == CAMERA_MODEL_360:
        phi = (ndc[0] - 0.5) * TAU
        theta = (0.5 - ndc[1]) * PI
        origin = vec3(zeros, zeros, zeros)
        direction = vec3(
            jnp.cos(theta) * jnp.sin(phi),
            jnp.sin(theta),
            -jnp.cos(theta) * jnp.cos(phi),
        )
    else:
        raise ValueError(f'unknown camera model {camera_model}')

    origin_w = transform_vector(world, origin) + world[:3, 3][:, None]
    direction_w = normalize(transform_vector(world, direction))
    return origin_w, direction_w
