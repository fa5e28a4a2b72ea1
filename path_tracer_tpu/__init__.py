"""path_tracer_tpu: a TPU-native spectral wavefront path tracer.

A from-scratch JAX/XLA/Pallas re-architecture of the capabilities of the
Vulkan compute renderer samukallio/path-tracer: 4-hero-wavelength
spectral transport with Jakob-Hanika RGB uplift, analytic primitives +
two-level-BVH triangle meshes, diffuse / GGX-metal / dispersive-
translucent / OpenPBR materials, nested dielectrics and participating
media, vMF-importance-sampled HDR skybox, pinhole / thin-lens / 360
cameras, progressive accumulation and four tone mappers -- implemented
as a wavefront pipeline over SoA path-state arrays, shardable across
TPU meshes.

Top-level convenience API; the full surface lives in the subpackages
(core, scene, models, ops, integrator, parallel, viewer, utils).
"""

from .core import constants
from .integrator.resolve import resolve
from .integrator.wavefront import RenderConfig, render, reset
from .ops.intersect import SceneLayout
from .scene.compile import PackedScene, compile_scene
from .scene.model import Scene, Transform
from .scene.procedural import (
    make_360_scene,
    make_cornell_scene,
    make_default_scene,
    make_multi_mesh_scene,
    make_sphere_array_scene,
    make_viking_hall_scene,
)

__version__ = '0.1.0'


def render_scene(scene, width=512, height=256, spp_rounds=32, seed=0,
                 tonemap_mode=constants.TONE_MAPPING_MODE_CLAMP,
                 brightness=1.0, camera_index=0,
                 termination_probability=0.05):
    """One-call scene -> image: compile, render, resolve.

    Returns an (H, W, 3) float32 tone-mapped sRGB image (jax array).
    """
    packed = compile_scene(scene, aspect_ratio=width / height)
    layout = SceneLayout.from_packed(packed)
    camera_model = getattr(packed, 'host_camera_models', (0,))[camera_index]
    config = RenderConfig(width=width, height=height,
                          camera_index=camera_index,
                          camera_model=camera_model)
    state = render(packed, config, spp_rounds, seed=seed,
                   termination_probability=termination_probability,
                   layout=layout)
    return resolve(state['accum'], width, height, brightness=brightness,
                   mode=tonemap_mode, lane=state['lane'])
