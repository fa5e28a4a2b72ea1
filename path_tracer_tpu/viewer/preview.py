"""Real-time preview raycaster: false-color modes + mouse picking.

Equivalent of the reference's preview renderer
(/root/reference/src/application/preview_render.{cpp,glsl}): one primary
ray per pixel through the editor camera, resolved to one of the debug
visualization modes (base color / shaded / normal / material-ID /
primitive-ID false colors), with selection highlighting and a pick query
that returns the shape index under the cursor (preview_render.glsl:174,
readback preview_render.cpp:96-116).

Complexity-heatmap modes visualize BVH cost using the portable XLA
traversal's iteration structure (the reference counts node visits in
its traversal loops, scene.glsl.inc:345,480).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..core.constants import SHAPE_INDEX_NONE
from ..core.spectrum import (
    observe_parametric_spectrum_under_d65,
    sample_parametric_spectrum,
    xyz_to_srgb,
)
from ..core.vec import normalize, transform_vector, vec3
from ..models.common import _col, sample_texture
from ..ops.intersect import SceneLayout, trace

PREVIEW_RENDER_MODE_BASE_COLOR = 0
PREVIEW_RENDER_MODE_BASE_COLOR_SHADED = 1
PREVIEW_RENDER_MODE_NORMAL = 2
PREVIEW_RENDER_MODE_MATERIAL_INDEX = 3
PREVIEW_RENDER_MODE_PRIMITIVE_INDEX = 4
PREVIEW_RENDER_MODE_MESH_COMPLEXITY = 5
PREVIEW_RENDER_MODE_SCENE_COMPLEXITY = 6

# 20-color false-color palette (preview_render.glsl COLORS table role).
_PALETTE = np.asarray([
    [0.90, 0.10, 0.29], [0.24, 0.71, 0.29], [1.00, 0.88, 0.10],
    [0.00, 0.51, 0.78], [0.96, 0.51, 0.19], [0.57, 0.12, 0.71],
    [0.27, 0.94, 0.94], [0.94, 0.20, 0.90], [0.82, 0.96, 0.24],
    [0.98, 0.75, 0.83], [0.00, 0.50, 0.50], [0.90, 0.75, 1.00],
    [0.67, 0.43, 0.16], [1.00, 0.98, 0.78], [0.50, 0.00, 0.00],
    [0.67, 1.00, 0.76], [0.50, 0.50, 0.00], [1.00, 0.84, 0.71],
    [0.00, 0.00, 0.50], [0.50, 0.50, 0.50],
], np.float32)


def shape_entities(scene):
    """Entities in packed-shape-index order (the scene compiler's
    flattening walk, scene/compile.py): shape index i from a pick/trace
    corresponds to the i-th entity yielded here."""
    from ..scene.compile import _ENTITY_TO_SHAPE_TYPE
    from ..scene.model import ENTITY_TYPE_MESH_INSTANCE

    for entity, _ in scene.walk_entities_with_transform():
        if entity.type not in _ENTITY_TO_SHAPE_TYPE:
            continue
        if entity.type == ENTITY_TYPE_MESH_INSTANCE and entity.mesh is None:
            continue
        yield entity


def _preview_rays(packed, width, height, camera_world):
    """One centered primary ray per pixel through a simple pinhole
    (preview_render.glsl:98-106: unit sensor at z=-1, aspect-corrected)."""
    aspect = width / height
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    ys = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
    gx, gy = jnp.meshgrid(xs, ys)
    near_x = (gx.reshape(-1) - 0.5) * aspect
    near_y = 0.5 - gy.reshape(-1)
    d = normalize(vec3(near_x, near_y, jnp.full_like(near_x, -1.0)))
    n = width * height
    origin = jnp.broadcast_to(camera_world[:3, 3][:, None], (3, n))
    direction = normalize(transform_vector(camera_world, d))
    return origin, direction


@partial(jax.jit, static_argnames=('layout', 'width', 'height', 'mode'))
def render_preview(packed, layout: SceneLayout, width, height,
                   camera_world, mode=PREVIEW_RENDER_MODE_BASE_COLOR_SHADED,
                   selected_shape=-1, brightness=1.0):
    """Render one preview frame -> (H, W, 3) float32."""
    origin, direction = _preview_rays(packed, width, height, camera_world)
    # Auto dispatch (use_packet=None): the Pallas packet kernel on TPU,
    # portable XLA elsewhere. Preview hard-coded the portable path
    # through round 4 and paid 24.3 s/frame on the 41k-tri viking at
    # 960x540 (artifacts/editor_r5.log "before") -- the per-lane masked
    # traversal is ~600x off the packet kernel on mesh scenes; the
    # reference's preview is its REAL-TIME editor path
    # (preview_render.glsl:96-178), so preview rides the production
    # kernel like every other trace.
    hit = trace(packed, layout, origin, direction)

    n = width * height
    miss = hit['shape'] == SHAPE_INDEX_NONE

    if mode in (PREVIEW_RENDER_MODE_BASE_COLOR,
                PREVIEW_RENDER_MODE_BASE_COLOR_SHADED):
        m = packed.materials
        beta = _col(m.base_spectrum, hit['material'])        # (3, N)
        color = xyz_to_srgb(observe_parametric_spectrum_under_d65(beta))
        if layout.materials_textured:
            tex = _col(m.base_texture, hit['material'])
            tex_beta = sample_texture(packed, tex, hit['uv'],
                                      layout.atlas_size)[:3]
            tex_color = xyz_to_srgb(
                observe_parametric_spectrum_under_d65(tex_beta))
            from ..core.constants import TEXTURE_INDEX_NONE
            color = jnp.where(tex == TEXTURE_INDEX_NONE, color,
                              color * tex_color)
        if mode == PREVIEW_RENDER_MODE_BASE_COLOR_SHADED:
            ndotv = jnp.sum(hit['normal'] * -direction, axis=0)
            color = color * ndotv
        # Skybox: observed color of the sky spectrum.
        if layout.has_skybox_texture:
            from ..integrator.scatter import sample_skybox_radiance  # noqa
            # Preview shows the skybox spectrum's observed color.
            from ..models.common import sample_texture as st
            idx = jnp.broadcast_to(packed.skybox_texture_index, (n,))
            phi = jnp.arctan2(direction[1], direction[0])
            theta = jnp.arcsin(jnp.clip(direction[2], -1.0, 1.0))
            uv = jnp.stack([0.5 + phi / (2 * np.pi), 0.5 + theta / np.pi], 0)
            sky_spec = st(packed, idx, uv, layout.atlas_size)
            sky = xyz_to_srgb(observe_parametric_spectrum_under_d65(sky_spec))
        else:
            sky_spec = jnp.broadcast_to(
                jnp.asarray([0.0, 0.0, 100.0, 1.0])[:, None], (4, n))
            sky = xyz_to_srgb(observe_parametric_spectrum_under_d65(sky_spec))
        color = jnp.where(miss, sky, color)
    elif mode == PREVIEW_RENDER_MODE_NORMAL:
        color = jnp.where(miss, 0.5 * (1.0 - direction),
                          0.5 * (hit['normal'] + 1.0))
    elif mode == PREVIEW_RENDER_MODE_MATERIAL_INDEX:
        palette = jnp.asarray(_PALETTE.T)
        color = jnp.where(miss, 0.0, palette[:, hit['material'] % 20])
    elif mode == PREVIEW_RENDER_MODE_PRIMITIVE_INDEX:
        palette = jnp.asarray(_PALETTE.T)
        color = jnp.where(miss, 0.0, palette[:, hit['primitive'] % 20])
    elif mode in (PREVIEW_RENDER_MODE_MESH_COMPLEXITY,
                  PREVIEW_RENDER_MODE_SCENE_COMPLEXITY):
        # Green traversal-cost heatmap (preview_render.glsl:154-163).
        # The reference counts per-thread BVH node visits; on this
        # architecture a lane's true traversal cost is its PACKET's pop
        # count (every lane rides every pop), so when the packet kernel
        # is the production trace path the heat adds the per-packet
        # interior+leaf pops broadcast to lanes (trace_inst stats=
        # 'lanes') -- scene complexity also counts instance entries
        # (the TLAS-level work, scene.glsl.inc:468-520's analogue).
        # Portable-path scenes (CPU, over-budget tables) keep the
        # per-lane iteration counts in hit['complexity'].
        heat_src = hit['complexity'].astype(jnp.float32)
        packet_path = (jax.default_backend() == 'tpu'
                       and layout.instance_slots
                       and layout.packet_mode == 'inst' and layout.inst_fit)
        if packet_path:
            from ..core.constants import HIT_TIME_LIMIT
            from ..ops import trace_inst
            *_hit, st = trace_inst.inst_trace(
                packed.inst_nodes, packed.inst_tris, packed.inst_rows,
                origin, direction,
                jnp.full((n,), HIT_TIME_LIMIT, jnp.float32),
                tlas_rows=layout.tlas_rows, stats='lanes')
            pops = (st[:, 0] + st[:, 1]).astype(jnp.float32)
            if mode == PREVIEW_RENDER_MODE_SCENE_COMPLEXITY:
                pops = pops + st[:, 3].astype(jnp.float32)
            heat_src = heat_src + pops
        heat = heat_src / 256.0
        zeros = jnp.zeros_like(heat)
        color = jnp.stack([zeros, heat, zeros], axis=0)
    else:
        raise ValueError(f'unknown preview mode {mode}')

    # Selection tint (preview_render.glsl:166-167).
    selected = hit['shape'] == selected_shape
    color = color * jnp.where(selected, jnp.asarray([[1.0], [0.5], [0.5]]), 1.0)
    color = jnp.clip(color * brightness, 0.0, 1.0)
    return jnp.moveaxis(color.reshape(3, height, width), 0, -1)


@partial(jax.jit, static_argnames=('layout', 'width', 'height'))
def _pick_shape(packed, layout: SceneLayout, width, height, camera_world,
                xy):
    """Jitted single-ray pick trace -> shape index (SHAPE_INDEX_NONE on
    miss). (x, y) ride as a TRACED (2,) array so every hover/click
    reuses one compiled program; eager dispatch on the deferred relay
    runtime cost 2.2-4.3 s per query (artifacts/pick_after_r5.log)."""
    aspect = width / height
    near_x = ((xy[0] + 0.5) / width - 0.5) * aspect
    near_y = 0.5 - (xy[1] + 0.5) / height
    d = normalize(vec3(near_x.reshape(1), near_y.reshape(1),
                       jnp.full((1,), -1.0, jnp.float32)))
    origin = camera_world[:3, 3][:, None]
    direction = normalize(transform_vector(camera_world, d))
    # Auto dispatch: even one ray pads into a single packet and rides
    # the production kernel -- the portable per-lane loop took 4.3 s
    # for this single-ray query on viking (artifacts/editor_r5.log).
    hit = trace(packed, layout, origin, direction)
    return hit['shape'][0]


def pick(packed, layout: SceneLayout, width, height, camera_world, x, y):
    """Mouse picking: shape index under pixel (x, y), or -1.

    The reference writes the hovered shape index to a query SSBO and
    reads it back double-buffered (preview_render.cpp:96-116); here it
    is one single-ray trace.
    """
    xy = jnp.asarray([x, y], jnp.float32)
    shape = int(_pick_shape(packed, layout, width, height, camera_world,
                            xy))
    return -1 if shape == SHAPE_INDEX_NONE else shape
