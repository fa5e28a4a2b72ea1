"""Scene compiler: flatten the scene document into padded device arrays.

TPU-native equivalent of the reference's PackSceneData + UpdateVulkanScene
(/root/reference/src/scene/scene.cpp:1115-1621, :1692-1975). Instead of
std430 SSBO blobs, the compiled scene is a pytree (`PackedScene`) of
struct-of-arrays jnp buffers: materials are a column-oriented attribute
table (one array per named attribute instead of the reference's uint
blob + bitcasts, which would be hostile to TPU gathers), meshes are SoA
face/vertex/BVH-node arrays, the two-level BVH keeps the reference's
semantics (agglomerative TLAS over shape AABBs, SAH BVH per mesh), and
the texture atlas is a float32 array stack.

Incremental recompilation honors the same dirty-flag cascade as the
reference: textures -> materials -> shapes -> globals; meshes -> shapes;
skybox -> globals.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from ..core.constants import (
    CAMERA_MODEL_PINHOLE,
    CAMERA_MODEL_THIN_LENS,
    MATERIAL_TYPE_BASIC_DIFFUSE,
    MATERIAL_TYPE_BASIC_METAL,
    MATERIAL_TYPE_BASIC_TRANSLUCENT,
    MATERIAL_TYPE_OPENPBR,
    SHAPE_INDEX_NONE,
    SHAPE_TYPE_MESH_INSTANCE,
    SHAPE_TYPE_NONE,
    SHAPE_TYPE_PLANE,
    TEXTURE_INDEX_NONE,
)
from ..core import uplift
from ..utils import log
from . import atlas as atlas_mod
from . import bvh as bvh_mod
from .model import (
    ENTITY_TYPE_CAMERA,
    ENTITY_TYPE_CUBE,
    ENTITY_TYPE_MESH_INSTANCE,
    ENTITY_TYPE_PLANE,
    ENTITY_TYPE_SPHERE,
    SCENE_DIRTY_ALL,
    SCENE_DIRTY_CAMERAS,
    SCENE_DIRTY_GLOBALS,
    SCENE_DIRTY_MATERIALS,
    SCENE_DIRTY_MESHES,
    SCENE_DIRTY_SHAPES,
    SCENE_DIRTY_SKYBOX_TEXTURE,
    SCENE_DIRTY_TEXTURES,
    Scene,
)

_ENTITY_TO_SHAPE_TYPE = {
    ENTITY_TYPE_MESH_INSTANCE: SHAPE_TYPE_MESH_INSTANCE,
    ENTITY_TYPE_PLANE: SHAPE_TYPE_PLANE,
    ENTITY_TYPE_SPHERE: 2,
    ENTITY_TYPE_CUBE: 3,
}


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


def _bucket(n, lo=4):
    """Pad a variable table dimension to a stable bucket (next power of
    two, minimum `lo`).

    Editor reaction time depends on it: jit cache keys include every
    packed array's SHAPE, so an un-padded table makes adding one
    entity/material/camera retrace the fused render program through
    the compile relay (measured 23-95 s per edit,
    tools/measure_editor.py). Bucketed tables keep the program cache
    key stable until a bucket boundary is crossed. Padded rows are
    inert -- no device code ever indexes them (hits only produce real
    shape/material indices; analytic pads carry a validity mask)."""
    n = max(int(n), 1)
    return max(lo, 1 << (n - 1).bit_length())


def _bucket_rows(n, lo=64):
    """Row bucket for the big geometry/node tables: next multiple of an
    eighth-of-magnitude quantum (<= 12.5% overhead) instead of a power
    of two, whose 50% worst case could push a VMEM-resident scene into
    the streaming path. Same purpose as _bucket: mesh edits that stay
    inside the bucket reuse every compiled program."""
    n = max(int(n), 1)
    q = max(lo, 1 << max((n - 1).bit_length() - 3, 0))
    return -(-n // q) * q


@_register
@dataclass
class MaterialTable:
    """Column-oriented material attribute table (SoA over materials).

    Slot 0 is the fallback material (a default OpenPBR surface), as in the
    reference material blob (scene.cpp:1240-1250). Spectra are
    parametric-spectrum coefficients (already uplifted on host).
    """

    type: Any
    opacity: Any
    base_spectrum: Any
    base_texture: Any
    specular_spectrum: Any
    specular_texture: Any
    roughness: Any
    roughness_texture: Any
    roughness_anisotropy: Any
    roughness_anisotropy_texture: Any
    ior: Any
    abbe_number: Any
    transmission_spectrum: Any
    transmission_depth: Any
    scattering_spectrum: Any
    scattering_anisotropy: Any
    # OpenPBR-only columns.
    base_weight: Any
    base_metalness: Any
    base_diffuse_roughness: Any
    specular_weight: Any
    specular_ior: Any
    transmission_weight: Any
    transmission_scatter_spectrum: Any
    transmission_scatter_anisotropy: Any
    transmission_dispersion_abbe: Any
    coat_weight: Any
    coat_spectrum: Any
    coat_ior: Any
    coat_roughness: Any
    coat_roughness_anisotropy: Any
    coat_darkening: Any
    emission_spectrum: Any
    emission_texture: Any
    emission_luminance: Any
    layer_bounce_limit: Any


@_register
@dataclass
class PackedScene:
    """Flattened scene as a pytree of device arrays.

    This is the cross-layer contract between the scene compiler and the
    integrator, the TPU analogue of the reference's UBO+SSBO set
    (scene.glsl.inc:121-179).
    """

    # Shapes (flattened active entity tree, world transforms). S is
    # bucket-padded (_bucket); padded slots carry SHAPE_TYPE_NONE and
    # identity transforms and are never referenced by hits.
    shape_type: Any             # (S,) int32
    shape_material: Any         # (S,) int32 material slot
    shape_mesh_root: Any        # (S,) int32 mesh BVH root node
    shape_world_from_object: Any  # (4, 4, S) float32 (lane axis last)
    shape_object_from_world: Any  # (4, 4, S) float32
    # Analytic shape groups for the type-batched intersectors: per
    # shape TYPE, a bucket-padded (K,) int32 array of shape indices and
    # a (K,) float32 validity mask (1 real / 0 pad). Keeping the
    # indices TRACED (not baked into the program) plus the bucketing is
    # what lets entity add/delete reuse the compiled render program.
    analytic_idx: Any           # dict {shape_type: (K,) int32}
    analytic_valid: Any         # dict {shape_type: (K,) float32}
    # Portable-path mesh instances as TRACED arrays (bucket-padded to
    # SceneLayout.instance_slots; padded slots aim at the degenerate
    # BVH2 root whose inverted bounds end traversal in zero
    # iterations). Same role as analytic_idx: instance add/delete
    # inside a bucket reuses the compiled portable program.
    portable_inst_shape: Any    # (max(slots,1),) int32 shape indices
    portable_inst_root: Any     # (max(slots,1),) int32 BVH2 roots

    # World AABB over all shapes (the root of the reference's TLAS,
    # scene.cpp:1489): feeds the coherence sort's Morton cells. The
    # interior TLAS nodes have no device consumer -- the flattened wide
    # BVH subsumes the TLAS's traversal role (scene/bvh8.py) -- so only
    # the bounds are packed (_build_tlas builds the full tree for the
    # instancing top level).
    scene_bounds: Any           # (3, 2) float32 [:, 0]=lo [:, 1]=hi

    # Mesh geometry (all meshes concatenated, indices rebased).
    face_positions: Any         # (3 verts, 3 comps, F)
    face_vertices: Any          # (3, F) int32
    vertex_normals: Any         # (3, V)
    vertex_uvs: Any             # (2, V)
    mesh_node_min: Any          # (3, B)
    mesh_node_max: Any          # (3, B)
    mesh_node_a: Any            # (B,) int32: child index | face begin
    mesh_node_b: Any            # (B,) int32: 0 | face end

    # Flat (rows, 128) tables for the Pallas wide-BVH packet kernel
    # (ops/trace_wide.py): instancing flattened to world space, 8-wide
    # nodes (one row each) and 4-aligned triangle blocks with inlined
    # world-space vertex attributes + shape index.
    wide_nodes: Any             # (W, 128) float32
    wide_tris: Any              # (R, 128) float32
    # v5 kernel tables (ops/trace_packet.py): same nodes with leaf
    # metas re-encoded for one geometry-only row per leaf, plus the
    # cold per-face-slot attribute side table (HBM; gathered once per
    # trace, never touched by the kernel).
    wide_nodes_g: Any           # (W, 128) float32
    wide_tris_g: Any            # (L, 128) float32
    wide_attrs: Any             # (L*8, 16) float32
    wide_face_map: Any          # (L*8,) int32 face slot -> mesh face

    # v6 two-level instanced tables (ops/trace_inst.py; (1, x) dummies
    # in 'flat' packet mode): TLAS rows + rebased object-space per-mesh
    # wide BVHs shared across instances, per-instance transform rows,
    # and the object-space attribute side table.
    inst_nodes: Any             # (W, 128) float32 [TLAS | mesh nodes]
    inst_tris: Any              # (R, 128) float32 object-space leaves
    inst_attrs: Any             # (R*8, 16) float32 object-space attrs
    inst_face_map: Any          # (R*8,) int32 face slot -> mesh face
    inst_rows: Any              # (I, 128) float32 inv 3x4 + mesh root
    inst_aux: Any               # (I, 16) float32 inv 3x3 + shape index

    materials: MaterialTable

    # Cameras.
    camera_model: Any           # (C,) int32
    camera_focal_length: Any    # (C,)
    camera_aperture_radius: Any  # (C,)
    camera_sensor_distance: Any  # (C,)
    camera_sensor_size: Any     # (C, 2)
    camera_world_from_camera: Any  # (C, 4, 4)

    # Texture atlas: flat rows so one bilinear tap is one row-gather.
    atlas: Any                  # (L*A*A, 4) float32
    # Quad atlas: each texel's clamped 2x2 neighborhood in one row, so a
    # bilinear tap is ONE row-gather instead of four. Built only when it
    # fits ATLAS_QUAD_LIMIT_BYTES (big atlases fall back to 4 gathers);
    # (1, 16) dummy otherwise.
    atlas_quad: Any             # (L*A*A, 16) float32 or (1, 16)
    # Texel-pair rows [c(x,y) | c(x,y+1)] bfloat16: a bilinear tap is
    # TWO gathers where the flat atlas needs four and the quad table
    # has outgrown its budget; (1, 8) dummy when itself over budget.
    atlas_pair: Any             # (L*A*A, 8) bfloat16 or (1, 8)
    atlas_layers: Any           # () int32 (layer count; A from field below)
    atlas_size: Any             # () int32
    texture_placement_min: Any  # (2, T)
    texture_placement_max: Any  # (2, T)
    texture_layer: Any          # (T,) int32
    texture_flags: Any          # (T,) int32
    # Same metadata packed as one row per texture so a tap fetches it
    # with ONE row-gather (gathers cost per lane-index on TPU):
    # [pmin.u, pmin.v, pmax.u, pmax.v, layer, flags, 0, 0] float32.
    texture_meta: Any           # (T, 8) float32

    # Globals (packed_scene_globals, scene.glsl.inc:90-99).
    skybox_mean_direction: Any  # (3,)
    skybox_concentration: Any   # ()
    skybox_sampling_probability: Any  # ()
    skybox_brightness: Any      # ()
    skybox_texture_index: Any   # () int32
    scene_scatter_rate: Any     # ()


def _uplift(color, table):
    return uplift.rgb_to_coefficients(np.asarray(color, np.float32), table)


def _texture_index(texture):
    if texture is None or texture.packed_texture_index < 0:
        return TEXTURE_INDEX_NONE
    return texture.packed_texture_index


def _pack_materials(scene: Scene, table):
    """Build the material attribute table. Slot 0 = fallback OpenPBR."""
    from .model import OpenPBRMaterial

    mats = [OpenPBRMaterial()] + list(scene.materials)
    m_real = len(mats)
    # Bucket-pad the material dimension (see _bucket): padded slots are
    # never gathered (material indices only come from real shapes).
    m = _bucket(m_real)

    def zeros(shape=(), dtype=np.float32):
        return np.zeros((m,) + shape, dtype)

    cols = {f.name: None for f in dataclasses.fields(MaterialTable)}
    cols.update(
        type=zeros(dtype=np.int32), opacity=zeros(),
        base_spectrum=zeros((3,)), base_texture=np.full(m, TEXTURE_INDEX_NONE, np.int32),
        specular_spectrum=zeros((3,)), specular_texture=np.full(m, TEXTURE_INDEX_NONE, np.int32),
        roughness=zeros(), roughness_texture=np.full(m, TEXTURE_INDEX_NONE, np.int32),
        roughness_anisotropy=zeros(),
        roughness_anisotropy_texture=np.full(m, TEXTURE_INDEX_NONE, np.int32),
        ior=np.full(m, 1.5, np.float32), abbe_number=np.full(m, 20.0, np.float32),
        transmission_spectrum=zeros((3,)), transmission_depth=zeros(),
        scattering_spectrum=zeros((3,)), scattering_anisotropy=zeros(),
        base_weight=zeros(), base_metalness=zeros(), base_diffuse_roughness=zeros(),
        specular_weight=zeros(), specular_ior=np.full(m, 1.5, np.float32),
        transmission_weight=zeros(), transmission_scatter_spectrum=zeros((3,)),
        transmission_scatter_anisotropy=zeros(),
        transmission_dispersion_abbe=np.full(m, 20.0, np.float32),
        coat_weight=zeros(), coat_spectrum=zeros((3,)),
        coat_ior=np.full(m, 1.6, np.float32), coat_roughness=zeros(),
        coat_roughness_anisotropy=zeros(), coat_darkening=zeros(),
        emission_spectrum=zeros((3,)),
        emission_texture=np.full(m, TEXTURE_INDEX_NONE, np.int32),
        emission_luminance=zeros(),
        layer_bounce_limit=np.full(m, 16, np.int32),
    )

    for i, mat in enumerate(mats):
        cols['type'][i] = mat.type
        cols['opacity'][i] = mat.opacity
        t = mat.type
        if t == MATERIAL_TYPE_BASIC_DIFFUSE:
            cols['base_spectrum'][i] = _uplift(mat.base_color, table)
            cols['base_texture'][i] = _texture_index(mat.base_texture)
        elif t == MATERIAL_TYPE_BASIC_METAL:
            cols['base_spectrum'][i] = _uplift(mat.base_color, table)
            cols['base_texture'][i] = _texture_index(mat.base_texture)
            cols['specular_spectrum'][i] = _uplift(mat.specular_color, table)
            cols['specular_texture'][i] = _texture_index(mat.specular_texture)
            cols['roughness'][i] = mat.roughness
            cols['roughness_texture'][i] = _texture_index(mat.roughness_texture)
            cols['roughness_anisotropy'][i] = mat.roughness_anisotropy
            cols['roughness_anisotropy_texture'][i] = _texture_index(mat.roughness_anisotropy_texture)
        elif t == MATERIAL_TYPE_BASIC_TRANSLUCENT:
            cols['ior'][i] = mat.ior
            cols['abbe_number'][i] = mat.abbe_number
            cols['roughness'][i] = mat.roughness
            cols['roughness_texture'][i] = _texture_index(mat.roughness_texture)
            cols['roughness_anisotropy'][i] = mat.roughness_anisotropy
            cols['roughness_anisotropy_texture'][i] = _texture_index(mat.roughness_anisotropy_texture)
            cols['transmission_spectrum'][i] = _uplift(mat.transmission_color, table)
            cols['transmission_depth'][i] = mat.transmission_depth
            cols['scattering_spectrum'][i] = _uplift(mat.scattering_color, table)
            cols['scattering_anisotropy'][i] = mat.scattering_anisotropy
        elif t == MATERIAL_TYPE_OPENPBR:
            cols['base_weight'][i] = mat.base_weight
            cols['base_spectrum'][i] = _uplift(mat.base_color, table)
            cols['base_texture'][i] = _texture_index(mat.base_color_texture)
            cols['base_metalness'][i] = mat.base_metalness
            cols['base_diffuse_roughness'][i] = mat.base_diffuse_roughness
            cols['specular_weight'][i] = mat.specular_weight
            cols['specular_spectrum'][i] = _uplift(mat.specular_color, table)
            cols['specular_ior'][i] = mat.specular_ior
            cols['roughness'][i] = mat.specular_roughness
            cols['roughness_texture'][i] = _texture_index(mat.specular_roughness_texture)
            cols['roughness_anisotropy'][i] = mat.specular_roughness_anisotropy
            cols['transmission_weight'][i] = mat.transmission_weight
            cols['transmission_spectrum'][i] = _uplift(mat.transmission_color, table)
            cols['transmission_depth'][i] = mat.transmission_depth
            cols['transmission_scatter_spectrum'][i] = _uplift(mat.transmission_scatter, table)
            cols['transmission_scatter_anisotropy'][i] = mat.transmission_scatter_anisotropy
            # The reference stores abbe/scale (openpbr.hpp:120); 0 scale
            # disables dispersion via an infinite effective Abbe number.
            scale = mat.transmission_dispersion_scale
            cols['transmission_dispersion_abbe'][i] = (
                mat.transmission_dispersion_abbe_number / scale if scale > 0 else 1e9)
            cols['coat_weight'][i] = mat.coat_weight
            cols['coat_spectrum'][i] = _uplift(mat.coat_color, table)
            cols['coat_ior'][i] = mat.coat_ior
            cols['coat_roughness'][i] = mat.coat_roughness
            cols['coat_roughness_anisotropy'][i] = mat.coat_roughness_anisotropy
            cols['coat_darkening'][i] = mat.coat_darkening
            cols['emission_spectrum'][i] = _uplift(mat.emission_color, table)
            cols['emission_texture'][i] = _texture_index(mat.emission_color_texture)
            cols['emission_luminance'][i] = mat.emission_luminance
            cols['layer_bounce_limit'][i] = mat.layer_bounce_limit
        mat.packed_material_index = i

    # Padded slots read as fully opaque so layout reconstruction from
    # the packed columns (SceneLayout.from_packed has_opacity) is not
    # fooled by the zero-filled tail.
    cols['opacity'][m_real:] = 1.0

    # Channels-first: spectra are stored (3, M) so per-lane gathers along
    # the trailing axis yield (3, N) with the lane axis minor.
    return MaterialTable(**{
        k: jnp.asarray(np.ascontiguousarray(v.T) if v.ndim == 2 else v)
        for k, v in cols.items()
    })


def _pack_meshes(scene: Scene):
    """Concatenate mesh geometry with globally rebased indices.

    Matches scene.cpp:1266-1343, except vertices keep full float32 normals
    and UVs (no octahedral/half packing -- TPU lanes prefer flat f32).
    """
    face_positions, face_vertices = [], []
    vertex_normals, vertex_uvs = [], []
    node_min, node_max, node_a, node_b = [], [], [], []
    vertex_base = face_base = node_base = 0

    for mesh in scene.meshes:
        if mesh.bvh is None:
            tri = mesh.positions[mesh.faces]  # (F, 3, 3)
            mesh.bvh = bvh_mod.build_bvh_cached(tri)
        bvh = mesh.bvh
        faces = mesh.faces[bvh.face_order]

        face_positions.append(mesh.positions[faces])
        face_vertices.append(faces.astype(np.int32) + vertex_base)
        vertex_normals.append(mesh.normals)
        vertex_uvs.append(mesh.uvs)

        is_leaf = bvh.b > 0
        node_min.append(bvh.node_min)
        node_max.append(bvh.node_max)
        node_a.append(np.where(is_leaf, bvh.a + face_base, bvh.a + node_base).astype(np.int32))
        node_b.append(np.where(is_leaf, bvh.b + face_base, 0).astype(np.int32))

        mesh.packed_root_node_index = node_base
        vertex_base += len(mesh.positions)
        face_base += len(faces)
        node_base += len(bvh.a)

    # One DEGENERATE node (inverted bounds): the root for padded
    # portable-instance slots. The portable traversal's root slab test
    # fails on it, so a padded slot's traversal exits with zero loop
    # iterations (ops/intersect.py traverse_mesh_bvh `start`).
    node_min.append(np.full((1, 3), 1e30, np.float32))
    node_max.append(np.full((1, 3), -1e30, np.float32))
    node_a.append(np.zeros(1, np.int32))
    node_b.append(np.zeros(1, np.int32))
    scene.packed_degenerate_root = node_base
    node_base += 1

    def cat(parts, empty_shape, dtype=np.float32):
        if parts:
            return np.concatenate(parts).astype(dtype)
        return np.zeros(empty_shape, dtype)

    def pad0(a, target):
        extra = target - len(a)
        if extra <= 0:
            return a
        return np.concatenate(
            [a, np.zeros((extra,) + a.shape[1:], a.dtype)])

    # Bucket-pad the concatenated dims (_bucket_rows) with inert zero
    # rows -- unreachable from any real BVH node -- so mesh imports and
    # edits within a bucket keep every array shape stable.
    faces_cat = pad0(cat(face_positions, (1, 3, 3)),
                     _bucket_rows(max(face_base, 1)))
    fverts_cat = pad0(cat(face_vertices, (1, 3), np.int32),
                      _bucket_rows(max(face_base, 1)))
    vn_cat = pad0(cat(vertex_normals, (1, 3)),
                  _bucket_rows(max(vertex_base, 1)))
    vu_cat = pad0(cat(vertex_uvs, (1, 2)),
                  _bucket_rows(max(vertex_base, 1)))
    nodes_target = _bucket_rows(node_base)
    nmin_cat = pad0(cat(node_min, (1, 3)), nodes_target)
    nmax_cat = pad0(cat(node_max, (1, 3)), nodes_target)
    na_cat = pad0(cat(node_a, (1,), np.int32), nodes_target)
    nb_cat = pad0(cat(node_b, (1,), np.int32), nodes_target)

    # Channels-first device layouts: lane/gather axis last.
    return dict(
        face_positions=np.ascontiguousarray(faces_cat.transpose(1, 2, 0)),
        face_vertices=np.ascontiguousarray(fverts_cat.T),
        vertex_normals=np.ascontiguousarray(vn_cat.T),
        vertex_uvs=np.ascontiguousarray(vu_cat.T),
        mesh_node_min=np.ascontiguousarray(nmin_cat.T),
        mesh_node_max=np.ascontiguousarray(nmax_cat.T),
        mesh_node_a=na_cat,
        mesh_node_b=nb_cat,
    )


ATLAS_QUAD_LIMIT_BYTES = 128 * 1024 * 1024


def atlas_quad_fits(num_layers, size):
    return num_layers * size * size * 16 * 4 <= ATLAS_QUAD_LIMIT_BYTES


def _build_atlas_quad(atlas):
    """(L, A, A, 4) atlas -> (L*A*A, 16) rows of each texel's clamped
    2x2 neighborhood [c(x,y), c(x+1,y), c(x,y+1), c(x+1,y+1)] (neighbors
    clamped at the layer edge, matching sample_texture's global clip).
    Returns a (1, 16) dummy when over the size budget."""
    layers, size = atlas.shape[0], atlas.shape[1]
    if not atlas_quad_fits(layers, size):
        return np.zeros((1, 16), np.float32)
    xp = np.concatenate([atlas[:, :, 1:], atlas[:, :, -1:]], axis=2)
    yp = np.concatenate([atlas[:, 1:], atlas[:, -1:]], axis=1)
    xyp = np.concatenate([xp[:, 1:], xp[:, -1:]], axis=1)
    quad = np.concatenate([atlas, xp, yp, xyp], axis=-1)  # (L, A, A, 16)
    return np.ascontiguousarray(quad.reshape(-1, 16)).astype(np.float32)


# The bf16 PAIR atlas only pays past the quad budget, i.e. on
# production-size atlases; cap it where its own operand would fall off
# the XLA gather fast path (tools/exp_waves3.py: ~64 MB).
ATLAS_PAIR_LIMIT_BYTES = 96 * 1024 * 1024


def atlas_pair_fits(num_layers, size):
    return num_layers * size * size * 8 * 2 <= ATLAS_PAIR_LIMIT_BYTES


def _build_atlas_pair(atlas):
    """(L, A, A, 4) atlas -> (L*A*A, 8) bfloat16 rows
    [c(x, y), c(x, y+1)] (the y-neighbor clamped at the layer edge,
    matching the 4-gather path's clip). A bilinear tap is then TWO row
    gathers (left pair + right pair) from an operand that stays under
    the XLA gather cliff where the f32 quad table (256 MB at a 2048^2
    atlas) cannot -- measured 52 -> ~26 ms per 2M-lane tap on the
    textured flagship. bf16 texels quantize reflectance/radiance
    coefficients by <= 0.4% rel; SceneLayout routes taps here only for
    atlases >= 1024^2 (small/test atlases keep exact f32 corners), and
    the CPU portable path uses the SAME table so goldens stay
    consistent. Returns a (1, 8) dummy when over budget."""
    layers, size = atlas.shape[0], atlas.shape[1]
    if not atlas_pair_fits(layers, size):
        return np.zeros((1, 8), jnp.bfloat16)
    yp = np.concatenate([atlas[:, 1:], atlas[:, -1:]], axis=1)
    pair = np.concatenate([atlas, yp], axis=-1)   # (L, A, A, 8)
    return np.ascontiguousarray(pair.reshape(-1, 8)).astype(jnp.bfloat16)


def _build_wide_tables(instances):
    """Flatten every mesh instance to world space and build the wide
    BVH tables for the packet kernel (scene/bvh8.py).

    Pre-transforming positions and (inverse-transpose) normals at
    compile time removes all per-instance ray transforms from the hot
    kernel and lets one SAH tree cull across instances -- the role the
    reference's TLAS plays at scene.glsl.inc:468-520, strictly
    stronger since it culls at triangle granularity.
    """
    from . import bvh8

    tris = gather_world_tris(instances)
    if tris is None:
        return bvh8.WideBvh(nodes=np.zeros((1, 128), np.float32),
                            tris=np.zeros((1, 128), np.float32),
                            face_map=np.full(4, -1, np.int32),
                            num_nodes=0, num_leaves=0), None
    return bvh8.build_wide_bvh(*tris), tris


def choose_packet_mode(instances):
    """Pick the packet-kernel table strategy for this scene.

    'inst' = v6 two-level (object-space per-mesh tables shared across
    instances + resident TLAS, ops/trace_inst.py); 'flat' = v5
    world-flattened single BVH (ops/trace_packet.py, kept for A/B
    measurement and as kernel-history; tools/exp_inst.py).

    v6 is the production path for EVERY mesh scene: besides making
    N instances cost O(mesh) table bytes, its register structure
    (per-packet ray registers in VMEM scratch instead of ~24 KB of
    loop-carried SSA values) measured 37% faster on coherent primaries
    and 26% faster on sorted bounce rays than v5 on the identical
    single-instance viking hall. Scenes whose object tables exceed the
    VMEM budget fall back to the portable traversal at trace time
    (SceneLayout.inst_fit).
    """
    return 'inst' if instances else 'flat'


def _pack_tlas_rows(bounds_min, bounds_max, width=None):
    """Wide TLAS rows over instance world AABBs (v6 top level).

    Same row format as mesh wide nodes; leaf metas carry
    INST_BASE+instance. Built by running the binary SAH builder over
    degenerate triangles whose AABBs equal the instance boxes, then the
    DP collapse with single-instance leaves.
    """
    from ..ops.trace_inst import INST_BASE
    from . import bvh8
    from .bvh import build_bvh

    width = width or bvh8.WIDE_WIDTH
    meta_lane = bvh8.NODE_LAYOUT[width]['meta']
    axis_lane = bvh8.NODE_LAYOUT[width]['axis']
    lo = np.asarray(bounds_min, np.float32)
    hi = np.asarray(bounds_max, np.float32)
    tris = np.stack([lo, hi, 0.5 * (lo + hi)], axis=1)  # (I, 3, 3)
    bvh = build_bvh(tris, max_leaf_faces=1)
    children, axes = bvh8.collapse_bvh2_sah(
        bvh.node_min, bvh.node_max, bvh.a, bvh.b, leaf_max=1, width=width)
    rows = np.zeros((len(children), 128), np.float32)
    rows[:, 0:3 * width] = bvh8.BIG
    rows[:, 3 * width:6 * width] = -bvh8.BIG
    rows[:, axis_lane] = np.asarray(axes, np.float32)
    for w, entries in enumerate(children):
        for c, (kind, p0, _count, m) in enumerate(entries):
            blo, bhi = bvh.node_min[m], bvh.node_max[m]
            for ax in range(3):
                rows[w, width * ax + c] = blo[ax]
                rows[w, 3 * width + width * ax + c] = bhi[ax]
            if kind == 'leaf':
                inst = int(bvh.face_order[p0])
                rows[w, meta_lane + c] = np.float32(INST_BASE + inst)
            else:
                # Interior children reference other TLAS rows; the TLAS
                # sits at the head of the node table, so no rebase.
                rows[w, meta_lane + c] = np.float32(p0)
    bvh8.write_octant_perms(rows, width=width)
    return rows


def _order_streamed_leaf_rows(nodes_cat, tris_cat, attrs_cat, fmap_cat,
                              parts, cam_pos, width, meta_lane):
    """Reorder concatenated leaf geometry rows by expected access rate.

    Scenes beyond the VMEM table budget keep a resident prefix of the
    leaf rows and stream the rest from HBM per pop
    (ops/trace_inst.py residency_split). Rows arrive here in wide-node
    BFS order, which puts TOP-OF-TREE leaves in the prefix -- but pop
    frequency under a camera is dominated by solid angle, not depth.
    This pass sorts whole leaves (their rows stay contiguous,
    multi-row-leaf DMAs are row0/row0+1) by

        sum over instances of  world_area(leaf AABB) / dist(cam)^2

    a projected-solid-angle proxy for how many rays reach the leaf, so
    the resident prefix holds the hottest geometry. Results are
    traversal-order-invariant (same triangles per leaf, metas rewritten
    to the new rows); only the streaming miss rate changes. The
    ordering uses the camera position at shapes-compile time -- later
    camera-only edits leave it stale, which is a performance heuristic
    going cold, never a correctness issue.

    Measured on the bench terrain (config 6, 1.8M tris, 2.3x VMEM
    oversubscription): NEUTRAL end-to-end (3.86 vs 3.84 Mrays/s) -- on
    a wide-open terrain the leaf count grows ~d^2 while importance
    decays 1/d^2, so access mass is spread nearly uniformly and no
    prefix choice wins. Kept because it is traversal-invariant, costs
    ~0.3 s once per shapes compile of a streamed scene, and
    view-concentrated large scenes (interiors, city blocks seen down a
    street) are exactly where a camera-weighted prefix should beat BFS
    order.

    parts: [(node_lo, node_hi, [world 3x4...])] per concatenated mesh.
    Returns (nodes_cat, tris_cat, attrs_cat, fmap_cat) reordered.
    """
    from . import bvh8

    limit = bvh8.LEAF_ROW_LIMIT
    metas = nodes_cat[:, meta_lane:meta_lane + width]
    widx, slot = np.nonzero(metas < 0)
    if widx.size == 0:
        return nodes_cat, tris_cat, attrs_cat, fmap_cat
    u = (-metas[widx, slot]).astype(np.int64)
    row0 = u % limit
    cnt = u // limit
    nrows = -(-cnt // 8)

    lo = np.stack([nodes_cat[widx, a * width + slot] for a in range(3)], -1)
    hi = np.stack([nodes_cat[widx, (3 + a) * width + slot]
                   for a in range(3)], -1)
    center = 0.5 * (lo + hi)
    half = np.maximum(0.5 * (hi - lo), 0.0)
    cam = np.asarray(cam_pos, np.float64)
    imp = np.zeros(widx.size, np.float64)
    for node_lo, node_hi, worlds in parts:
        sel = (widx >= node_lo) & (widx < node_hi)
        if not sel.any():
            continue
        c, h = center[sel], half[sel]
        for world in worlds:
            r, t = world[:3, :3], world[:3, 3]
            cw = c @ r.T + t
            hw = np.abs(h) @ np.abs(r).T     # conservative world extents
            area = 2.0 * (hw[:, 0] * hw[:, 1] + hw[:, 1] * hw[:, 2]
                          + hw[:, 2] * hw[:, 0]) + 1e-12
            d2 = np.maximum(np.sum((cw - cam) ** 2, axis=-1), 1e-2)
            imp[sel] += area / d2

    order = np.argsort(-imp, kind='stable')
    o_n = nrows[order]
    o_starts = np.concatenate([[0], np.cumsum(o_n)[:-1]])
    # Old rows of each leaf, walked in the new order.
    src_rows = (np.repeat(row0[order], o_n)
                + np.arange(int(o_n.sum()))
                - np.repeat(o_starts, o_n))
    claimed = np.zeros(len(tris_cat), bool)
    claimed[src_rows] = True
    src_of_new = np.concatenate([src_rows, np.nonzero(~claimed)[0]])
    assert len(src_of_new) == len(tris_cat)

    tris_new = tris_cat[src_of_new]
    attrs_new = attrs_cat.reshape(len(tris_cat), 8, -1)[src_of_new]
    attrs_new = attrs_new.reshape(-1, attrs_cat.shape[1])
    fmap_new = fmap_cat.reshape(len(tris_cat), 8)[src_of_new].reshape(-1)

    new_row0 = np.empty(widx.size, np.int64)
    new_row0[order] = o_starts
    nodes_new = nodes_cat.copy()
    nodes_new[widx, meta_lane + slot] = (
        -(cnt * limit + new_row0)).astype(np.float32)
    return nodes_new, tris_new, attrs_new, fmap_new


def _build_inst_tables(instances, inst_bounds, width=None, leaf_max=None,
                       cam_pos=None):
    """Two-level (v6) tables: per-unique-mesh object-space wide BVHs,
    rebased + concatenated behind the TLAS, plus per-instance rows.

    Returns dict of numpy arrays + the static TLAS row count.
    """
    from . import bvh8

    width = width or bvh8.WIDE_WIDTH
    leaf_max = leaf_max or bvh8.LEAF_MAX
    meta_lane = bvh8.NODE_LAYOUT[width]['meta']
    mesh_tables = {}
    order = []
    for _, entity, _, _ in instances:
        mesh = entity.mesh
        if id(mesh) in mesh_tables:
            continue
        # Memoize the object-space tables PER MESH: they depend only on
        # the mesh geometry, but this function runs on every
        # shapes-dirty compile (any material/transform/entity edit).
        # Without the memo each edit re-paid the SBVH + DP collapse
        # (~1.5 s for a 41k-tri mesh, tools/measure_editor.py); with it
        # only genuinely new/changed geometry builds.
        key = (width, leaf_max, bvh8.LEAF_FMT, id(mesh.positions),
               id(mesh.faces), len(mesh.faces))
        cached = getattr(mesh, '_wide_table_cache', None)
        if cached is not None and cached[0] == key:
            mesh_tables[id(mesh)] = cached[1]
            order.append(id(mesh))
            continue
        faces = np.asarray(mesh.faces)
        tri = np.asarray(mesh.positions, np.float32)[faces]
        nrm = np.asarray(mesh.normals, np.float32)[faces]
        uv = np.asarray(mesh.uvs, np.float32)[faces]
        shp = np.zeros(len(faces), np.float32)
        wide = bvh8.build_wide_bvh(tri, nrm, uv, shp, spatial=True,
                                   width=width, leaf_max=leaf_max)
        mesh_tables[id(mesh)] = bvh8.pack_wide_geom(wide, tri, nrm, uv, shp)
        mesh._wide_table_cache = (key, mesh_tables[id(mesh)])
        order.append(id(mesh))

    tlas = _pack_tlas_rows([b[0] for b in inst_bounds],
                           [b[1] for b in inst_bounds], width=width)
    # Bucket-pad the TLAS region (all-zero rows: meta 0 = no child,
    # never visited) so layout.tlas_rows -- a static of the kernel
    # program -- survives instance add/delete within the bucket.
    t_rows = _bucket(len(tlas), lo=8)
    tlas = np.concatenate(
        [tlas, np.zeros((t_rows - len(tlas), 128), np.float32)])

    node_parts, tri_parts, attr_parts, fmap_parts = [], [], [], []
    node_base, row_base = {}, {}
    part_ranges = []
    nb, rb = 0, 0
    for key in order:
        ng, tg, at, fm = mesh_tables[key]
        ng = ng.copy()
        metas = ng[:, meta_lane:meta_lane + width]
        interior = metas > 0
        leafm = metas < 0
        metas[interior] += t_rows + nb
        u = -metas[leafm]
        row = u % bvh8.LEAF_ROW_LIMIT + rb
        cnt = u // bvh8.LEAF_ROW_LIMIT
        metas[leafm] = -(cnt * bvh8.LEAF_ROW_LIMIT + row)
        ng[:, meta_lane:meta_lane + width] = metas
        node_base[key] = t_rows + nb
        row_base[key] = rb
        part_ranges.append((t_rows + nb, t_rows + nb + len(ng), key))
        nb += len(ng)
        rb += len(tg)
        node_parts.append(ng)
        tri_parts.append(tg)
        attr_parts.append(at)
        fm = fm.copy()
        fmap_parts.append(fm)
    if rb > bvh8.LEAF_ROW_LIMIT:
        raise ValueError(
            f'{rb} concatenated geometry rows exceed the '
            f'{bvh8.LEAF_ROW_LIMIT}-row leaf encoding '
            f'(~{bvh8.LEAF_ROW_LIMIT * 8 / 1e6:.0f}M triangles)')

    # Instance rows bucket: 1 stays exact (resolve_inst_attributes'
    # single-instance broadcast special case must keep firing for the
    # flagship single-mesh scenes), otherwise _bucket. Padded rows are
    # all-zero and unreachable (TLAS leaves only tag real instances).
    i_slots = 1 if len(instances) == 1 else _bucket(len(instances))
    inst_rows = np.zeros((i_slots, 128), np.float32)
    inst_aux = np.zeros((i_slots, 16), np.float32)
    for i, (shape_index, entity, _world, inv_world) in enumerate(instances):
        inst_rows[i, 0:12] = inv_world[:3, :4].reshape(12)
        inst_rows[i, 12] = np.float32(node_base[id(entity.mesh)])
        inst_aux[i, 0:9] = inv_world[:3, :3].reshape(9)
        inst_aux[i, 9] = np.float32(shape_index)

    tris_cat = np.concatenate(tri_parts).astype(np.float32)
    attrs_cat = np.concatenate(attr_parts).astype(np.float32)
    fmap_cat = np.concatenate(fmap_parts).astype(np.int32)
    nodes_cat = np.concatenate([tlas] + node_parts).astype(np.float32)

    # Scenes that will stream leaf rows from HBM get their rows ordered
    # by camera-projected importance so the resident prefix
    # (ops/trace_inst.py residency_split) holds the hottest geometry.
    from ..ops.trace_inst import VMEM_TABLE_LIMIT_BYTES
    pad = leaf_max // 8 - 1
    est_rows = (_bucket_rows(len(nodes_cat)) + _bucket_rows(
        len(tris_cat) + pad) + max(len(instances), 1))
    if cam_pos is not None and est_rows * 512 > VMEM_TABLE_LIMIT_BYTES:
        worlds_by_mesh = {}
        for _, entity, world, _ in instances:
            worlds_by_mesh.setdefault(id(entity.mesh), []).append(
                np.asarray(world, np.float64)[:3, :4])
        parts = [(lo, hi, worlds_by_mesh.get(key, []))
                 for lo, hi, key in part_ranges]
        nodes_cat, tris_cat, attrs_cat, fmap_cat = (
            _order_streamed_leaf_rows(nodes_cat, tris_cat, attrs_cat,
                                      fmap_cat, parts, cam_pos, width,
                                      meta_lane))

    # Trailing pad rows let the streaming kernel's fixed-size leaf DMA
    # (leaf_max/8 rows) read past the final leaf without overrunning.
    if pad:
        tris_cat = np.concatenate(
            [tris_cat, np.zeros((pad, 128), np.float32)])
        attrs_cat = np.concatenate(
            [attrs_cat, np.zeros((pad * 8, 16), np.float32)])
        fmap_cat = np.concatenate(
            [fmap_cat, np.full(pad * 8, -1, np.int32)])

    # Bucket-pad node and geometry rows (_bucket_rows) with inert zero
    # rows: small mesh edits keep the kernel-program cache key stable.
    def pad_rows(a, target, fill=0):
        extra = target - len(a)
        if extra <= 0:
            return a
        return np.concatenate(
            [a, np.full((extra,) + a.shape[1:], fill, a.dtype)])

    n_rows = _bucket_rows(len(nodes_cat))
    r_rows = _bucket_rows(len(tris_cat))
    return dict(
        inst_nodes=pad_rows(nodes_cat, n_rows),
        inst_tris=pad_rows(tris_cat, r_rows),
        inst_attrs=pad_rows(attrs_cat, r_rows * 8),
        inst_face_map=pad_rows(fmap_cat, r_rows * 8, fill=-1),
        inst_rows=inst_rows,
        inst_aux=inst_aux,
    ), t_rows


def entity_packs_shape(entity):
    """Shape-walk predicate shared by the compile pass, the host
    layout builder and the tools mirror: a mesh instance without a
    mesh -- or with a faceless one (fresh asset, empty import) -- has
    no geometry to hit and packs no shape slot (a zero-face tree would
    crash the wide-BVH build)."""
    if entity.type not in _ENTITY_TO_SHAPE_TYPE:
        return False
    if entity.type == ENTITY_TYPE_MESH_INSTANCE:
        return entity.mesh is not None and len(entity.mesh.faces) > 0
    return True


def collect_mesh_instances(scene):
    """(instances, bounds) in walk order, as _build_inst_tables expects:
    instances = [(shape_index, entity, world, object_from_world)], and
    bounds = [(lo, hi)] world AABBs per instance. Mirrors the compile
    pass's shape walk, for tools that rebuild inst tables standalone."""
    instances, bounds = [], []
    index = 0
    for entity, world in scene.walk_entities_with_transform():
        if not entity_packs_shape(entity):
            continue
        stype = _ENTITY_TO_SHAPE_TYPE[entity.type]
        if stype == SHAPE_TYPE_MESH_INSTANCE:
            inv = np.linalg.inv(world.astype(np.float64)).astype(np.float32)
            instances.append((index, entity, world, inv))
            bounds.append(_shape_bounds(stype, world, entity.mesh))
        index += 1
    return instances, bounds


def gather_world_tris(instances):
    """World-space triangle soup of every mesh instance: (positions
    (F,3,3), normals (F,3,3), uvs (F,3,2), shape index (F,)), or None
    if the scene has no mesh faces."""
    pos_parts, nrm_parts, uv_parts, shp_parts = [], [], [], []
    for shape_index, entity, world, inv_world in instances:
        mesh = entity.mesh
        faces = np.asarray(mesh.faces)
        if len(faces) == 0:
            continue
        p = np.asarray(mesh.positions, np.float32)[faces]        # (F, 3, 3)
        p = p @ world[:3, :3].T + world[:3, 3]
        n = np.asarray(mesh.normals, np.float32)[faces]          # (F, 3, 3)
        n = n @ inv_world[:3, :3]   # row-vector form of (W^-1)^T n
        n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        uv = np.asarray(mesh.uvs, np.float32)[faces]             # (F, 3, 2)
        pos_parts.append(p.astype(np.float32))
        nrm_parts.append(n.astype(np.float32))
        uv_parts.append(uv)
        shp_parts.append(np.full(len(faces), shape_index, np.float32))

    if not pos_parts:
        return None
    return (np.concatenate(pos_parts), np.concatenate(nrm_parts),
            np.concatenate(uv_parts), np.concatenate(shp_parts))


def _shape_bounds(shape_type, world_from_object, mesh, *_unused):
    """World AABB of a shape (scene.cpp:1031-1093). Mesh bounds come from
    the host-side BVH root (never from device arrays: any device->host
    readback permanently degrades the TPU runtime's execution mode)."""
    if shape_type == SHAPE_TYPE_MESH_INSTANCE:
        lo = mesh.bvh.node_min[0]
        hi = mesh.bvh.node_max[0]
    elif shape_type == SHAPE_TYPE_PLANE:
        lo = np.array([-1e9, -1e9, -1e-9], np.float32)
        hi = np.array([+1e9, +1e9, +1e-9], np.float32)
    else:  # sphere, cube
        lo = -np.ones(3, np.float32)
        hi = np.ones(3, np.float32)
    corners = np.array([[x, y, z, 1.0] for x in (lo[0], hi[0])
                        for y in (lo[1], hi[1]) for z in (lo[2], hi[2])], np.float32)
    world = corners @ world_from_object.T
    return world[:, :3].min(axis=0), world[:, :3].max(axis=0)


def _build_tlas(bounds_min, bounds_max):
    """Agglomerative bottom-up TLAS (scene.cpp:1402-1492).

    Repeatedly merges mutually-best AABB pairs by summed-extent heuristic.
    Returns SoA arrays with the root at index 0; child indices (a, b)
    equal 0 for leaves.
    """
    s = len(bounds_min)
    node_min = [np.zeros(3, np.float32)]
    node_max = [np.zeros(3, np.float32)]
    child_a, child_b = [0], [0]
    node_shape = [SHAPE_INDEX_NONE]

    if s == 0:
        return (np.stack(node_min, axis=-1), np.stack(node_max, axis=-1),
                np.asarray(child_a, np.int32), np.asarray(child_b, np.int32),
                np.asarray(node_shape, np.int32))

    alive = []  # node indices of current roots
    for i in range(s):
        alive.append(len(node_min))
        node_min.append(bounds_min[i])
        node_max.append(bounds_max[i])
        child_a.append(0)
        child_b.append(0)
        node_shape.append(i)

    def best_match(idx_a):
        lo_a, hi_a = node_min[alive[idx_a]], node_max[alive[idx_a]]
        best, best_area = -1, np.inf
        for idx_b in range(len(alive)):
            if idx_b == idx_a:
                continue
            size = np.maximum(hi_a, node_max[alive[idx_b]]) - np.minimum(lo_a, node_min[alive[idx_b]])
            # Note: the reference's heuristic (scene.cpp:1437) uses
            # x*y + y*z + z*z; we keep the standard half-area x*y+y*z+z*x.
            area = size[0] * size[1] + size[1] * size[2] + size[2] * size[0]
            if area <= best_area:
                best_area, best = area, idx_b
        return best

    ia = 0
    ib = best_match(ia)
    while len(alive) > 1:
        ic = best_match(ib)
        if ia == ic:
            na, nb = alive[ia], alive[ib]
            merged = len(node_min)
            node_min.append(np.minimum(node_min[na], node_min[nb]))
            node_max.append(np.maximum(node_max[na], node_max[nb]))
            child_a.append(na)
            child_b.append(nb)
            node_shape.append(SHAPE_INDEX_NONE)

            alive[ia] = merged
            alive[ib] = alive[-1]
            alive.pop()
            if ia == len(alive):
                ia = ib
            ib = best_match(ia)
        else:
            ia, ib = ib, ic

    # Move the final root into slot 0 (scene.cpp:1489-1491).
    root = alive[0]
    last = len(node_min) - 1
    for arr in (node_min, node_max, child_a, child_b, node_shape):
        arr[0] = arr[root]
    if root != last:
        for arr in (node_min, node_max, child_a, child_b, node_shape):
            arr[root] = arr[last]
        # Fix parents referring to the moved node.
        for i in range(len(child_a)):
            if child_a[i] == last:
                child_a[i] = root
            if child_b[i] == last:
                child_b[i] = root
    for arr in (node_min, node_max, child_a, child_b, node_shape):
        arr.pop()

    return (np.stack(node_min, axis=-1).astype(np.float32),
            np.stack(node_max, axis=-1).astype(np.float32),
            np.asarray(child_a, np.int32), np.asarray(child_b, np.int32),
            np.asarray(node_shape, np.int32))


def _fit_skybox_vmf(pixels):
    """Fit a von Mises-Fisher lobe to an equirect HDR skybox
    (scene.cpp:1569-1600): luminance^2- and solid-angle-weighted mean
    direction, concentration from mean resultant length."""
    h, w = pixels.shape[:2]
    y = np.arange(h)
    x = np.arange(w)
    theta = (0.5 - (y + 0.5) / h) * np.pi
    phi = ((x + 0.5) / w - 0.5) * 2 * np.pi
    lum = pixels[..., :3] @ np.array([0.2126, 0.7152, 0.0722], np.float32)
    weight = np.cos(theta)[:, None] * lum * lum
    ct, st = np.cos(theta), np.sin(theta)
    cp, sp = np.cos(phi), np.sin(phi)
    direction = np.stack([
        np.broadcast_to(ct[:, None] * cp[None, :], (h, w)),
        np.broadcast_to(ct[:, None] * sp[None, :], (h, w)),
        np.broadcast_to(st[:, None], (h, w)),
    ], axis=-1)
    wsum = weight.sum()
    mean = (weight[..., None] * direction).sum(axis=(0, 1)) / max(wsum, 1e-12)
    r = np.linalg.norm(mean)
    r = min(r, 0.9999)
    concentration = r * (3.0 - r * r) / (1.0 - r * r)
    return (mean / max(r, 1e-12)).astype(np.float32), np.float32(concentration)


def compile_scene(scene: Scene, prev: PackedScene = None, aspect_ratio=2.0,
                  spectrum_table=None) -> PackedScene:
    """Compile (or incrementally recompile) the scene into a PackedScene.

    Dirty-flag cascade follows PackSceneData (scene.cpp:1115-1621).
    `aspect_ratio` feeds pinhole sensor sizing (the reference hardcodes
    2.0 at scene.cpp:1518).
    """
    dirty = scene.dirty_flags if prev is not None else SCENE_DIRTY_ALL
    with log.timer('compile.pack', dirty=int(dirty),
                   incremental=prev is not None):
        return _compile_scene(scene, prev, aspect_ratio, spectrum_table,
                              dirty)


def _compile_scene(scene, prev, aspect_ratio, spectrum_table, dirty):
    table = spectrum_table if spectrum_table is not None else uplift.get_table()
    out = {} if prev is None else {f.name: getattr(prev, f.name)
                                   for f in dataclasses.fields(PackedScene)}

    if dirty & SCENE_DIRTY_TEXTURES:
        atlas, metas = atlas_mod.pack_textures(scene.textures, table)
        for i, texture in enumerate(scene.textures):
            texture.packed_texture_index = i
        if metas:
            out.update(
                texture_placement_min=jnp.asarray(
                    np.stack([m.placement_min for m in metas], axis=-1)),
                texture_placement_max=jnp.asarray(
                    np.stack([m.placement_max for m in metas], axis=-1)),
                texture_layer=jnp.asarray([m.layer for m in metas], jnp.int32),
                texture_flags=jnp.asarray([m.flags for m in metas], jnp.int32),
            )
        else:
            out.update(
                texture_placement_min=jnp.zeros((2, 1)),
                texture_placement_max=jnp.ones((2, 1)),
                texture_layer=jnp.zeros(1, jnp.int32),
                texture_flags=jnp.zeros(1, jnp.int32),
            )
        meta_rows = np.zeros((max(len(metas), 1), 8), np.float32)
        for i, m in enumerate(metas):
            meta_rows[i, 0:2] = m.placement_min
            meta_rows[i, 2:4] = m.placement_max
            meta_rows[i, 4] = np.float32(m.layer)
            meta_rows[i, 5] = np.float32(m.flags)
        if not metas:
            meta_rows[0, 2:4] = 1.0
        out['texture_meta'] = jnp.asarray(meta_rows)
        out['atlas'] = jnp.asarray(
            np.ascontiguousarray(atlas.reshape(-1, 4)))
        out['atlas_quad'] = jnp.asarray(_build_atlas_quad(atlas))
        out['atlas_pair'] = jnp.asarray(_build_atlas_pair(atlas))
        out['atlas_layers'] = jnp.asarray(atlas.shape[0], jnp.int32)
        out['atlas_size'] = jnp.asarray(atlas.shape[1], jnp.int32)
        dirty |= SCENE_DIRTY_MATERIALS | SCENE_DIRTY_SKYBOX_TEXTURE

    if dirty & SCENE_DIRTY_MATERIALS:
        out['materials'] = _pack_materials(scene, table)
        dirty |= SCENE_DIRTY_SHAPES

    if dirty & SCENE_DIRTY_MESHES:
        mesh_arrays = _pack_meshes(scene)
        out.update({k: jnp.asarray(v) for k, v in mesh_arrays.items()})
        dirty |= SCENE_DIRTY_SHAPES

    if dirty & SCENE_DIRTY_SHAPES:
        shape_type, shape_material, shape_mesh_root = [], [], []
        world_from_object, object_from_world = [], []
        bounds_lo, bounds_hi = [], []
        instances = []  # (shape_index, entity, world, object_from_world)

        for entity, world in scene.walk_entities_with_transform():
            if not entity_packs_shape(entity):
                continue
            stype = _ENTITY_TO_SHAPE_TYPE[entity.type]
            material_slot = (entity.material.packed_material_index
                             if entity.material is not None else 0)
            mesh_root = (entity.mesh.packed_root_node_index
                         if entity.type == ENTITY_TYPE_MESH_INSTANCE else 0)
            entity.packed_shape_index = len(shape_type)

            shape_type.append(stype)
            shape_material.append(material_slot)
            shape_mesh_root.append(mesh_root)
            world_from_object.append(world)
            inv_world = np.linalg.inv(world.astype(np.float64)).astype(np.float32)
            object_from_world.append(inv_world)
            if stype == SHAPE_TYPE_MESH_INSTANCE:
                instances.append((entity.packed_shape_index, entity,
                                  world, inv_world))
            lo, hi = _shape_bounds(stype, world,
                                   getattr(entity, 'mesh', None))
            bounds_lo.append(lo)
            bounds_hi.append(hi)

        s = len(shape_type)
        # Bucket-pad the shape tables (see _bucket): padded slots are
        # SHAPE_TYPE_NONE with identity transforms, never referenced.
        eye = np.eye(4, dtype=np.float32)
        for _ in range(_bucket(s) - s):
            shape_type.append(SHAPE_TYPE_NONE)
            shape_material.append(0)
            shape_mesh_root.append(0)
            world_from_object.append(eye)
            object_from_world.append(eye)
        out.update(
            shape_type=jnp.asarray(shape_type, jnp.int32),
            shape_material=jnp.asarray(shape_material, jnp.int32),
            shape_mesh_root=jnp.asarray(shape_mesh_root, jnp.int32),
            shape_world_from_object=jnp.asarray(
                np.stack(world_from_object, axis=-1)),
            shape_object_from_world=jnp.asarray(
                np.stack(object_from_world, axis=-1)),
        )

        # Analytic groups: bucket-padded traced index arrays per type.
        by_type = {}
        for i, t in enumerate(shape_type[:s]):
            if t != SHAPE_TYPE_MESH_INSTANCE and t != SHAPE_TYPE_NONE:
                by_type.setdefault(int(t), []).append(i)
        generic = bool(getattr(scene, 'compile_generic', False))
        if generic:
            # Generic-programs mode (see build_layout_host): pre-bake
            # empty bucket groups for every analytic type so adding
            # the first plane/sphere/cube never changes the program.
            from ..core.constants import SHAPE_TYPE_CUBE, SHAPE_TYPE_SPHERE
            for t in (SHAPE_TYPE_PLANE, SHAPE_TYPE_SPHERE, SHAPE_TYPE_CUBE):
                by_type.setdefault(int(t), [])
        a_idx, a_valid = {}, {}
        for t, idxs in sorted(by_type.items()):
            # Padded analytic slots cost REAL per-lane work every round
            # (the intersectors run on them; measured -22% on the
            # analytic-bound Cornell bench), so only generic (editor)
            # programs pay for the padding; specialized batch programs
            # keep exact group sizes and accept the retrace on entity
            # add/delete.
            k_pad = _bucket(len(idxs)) if generic else max(len(idxs), 1)
            arr = np.zeros(k_pad, np.int32)
            arr[:len(idxs)] = idxs
            val = np.zeros(k_pad, np.float32)
            val[:len(idxs)] = 1.0
            a_idx[t] = jnp.asarray(arr)
            a_valid[t] = jnp.asarray(val)
        out['analytic_idx'] = a_idx
        out['analytic_valid'] = a_valid

        # Portable-path instance table (see PackedScene docstring).
        i_real = len(instances)
        i_slots = (0 if i_real == 0
                   else 1 if i_real == 1 else _bucket(i_real))
        deg = int(scene.packed_degenerate_root)
        pi_shape = np.zeros(max(i_slots, 1), np.int32)
        pi_root = np.full(max(i_slots, 1), deg, np.int32)
        for k, (si, entity, _w, _iw) in enumerate(instances):
            pi_shape[k] = si
            pi_root[k] = int(entity.mesh.packed_root_node_index)
        out['portable_inst_shape'] = jnp.asarray(pi_shape)
        out['portable_inst_root'] = jnp.asarray(pi_root)

        if bounds_lo:
            lo = np.min(np.stack(bounds_lo), axis=0)
            hi = np.max(np.stack(bounds_hi), axis=0)
        else:
            lo, hi = np.zeros(3, np.float32), np.zeros(3, np.float32)
        out['scene_bounds'] = jnp.asarray(
            np.stack([lo, hi], axis=-1).astype(np.float32))

        from . import bvh8
        packet_mode = choose_packet_mode(instances)
        if packet_mode == 'inst':
            # v6 two-level tables; instance bounds in walk order.
            inst_bounds = [(bounds_lo[si], bounds_hi[si])
                           for si, _, _, _ in instances]
            cam_pos = None
            for entity, world in scene.walk_entities_with_transform():
                if entity.type == ENTITY_TYPE_CAMERA:
                    cam_pos = np.asarray(world, np.float32)[:3, 3]
                    break
            tables, t_rows = _build_inst_tables(instances, inst_bounds,
                                                cam_pos=cam_pos)
            for k, v in tables.items():
                out[k] = jnp.asarray(v)
            scene.packet_tlas_rows = t_rows
            # v5/v3 world-flattened tables are not built in this mode.
            wide = bvh8.WideBvh(nodes=np.zeros((1, 128), np.float32),
                                tris=np.zeros((1, 128), np.float32),
                                face_map=np.full(4, -1, np.int32),
                                num_nodes=0, num_leaves=0)
            world_tris = None
        else:
            wide, world_tris = _build_wide_tables(instances)
            scene.packet_tlas_rows = 0
            for k, shape in (('inst_nodes', (1, 128)),
                             ('inst_tris', (1, 128)),
                             ('inst_attrs', (8, 16)),
                             ('inst_rows', (1, 128)),
                             ('inst_aux', (1, 16))):
                out[k] = jnp.zeros(shape, jnp.float32)
            out['inst_face_map'] = jnp.full(8, -1, jnp.int32)
        scene.packet_mode = packet_mode

        def _pad_rows(a, target, fill=0):
            extra = target - len(a)
            if extra <= 0:
                return a
            return np.concatenate(
                [a, np.full((extra,) + a.shape[1:], fill, a.dtype)])

        out['wide_nodes'] = jnp.asarray(
            _pad_rows(wide.nodes, _bucket_rows(len(wide.nodes))))
        out['wide_tris'] = jnp.asarray(
            _pad_rows(wide.tris, _bucket_rows(len(wide.tris))))
        if world_tris is not None:
            nodes_g, tris_g, attrs, face_map_g = bvh8.pack_wide_geom(
                wide, *world_tris)
            # Same row bucketing as the v6 tables: inert zero rows keep
            # the kernel-program cache key stable under mesh edits.
            wg = _bucket_rows(len(nodes_g))
            rg = _bucket_rows(len(tris_g))
            nodes_g = _pad_rows(nodes_g, wg)
            tris_g = _pad_rows(tris_g, rg)
            attrs = _pad_rows(attrs, rg * 8)
            face_map_g = _pad_rows(face_map_g, rg * 8, fill=-1)
        else:
            nodes_g = wide.nodes
            tris_g = np.zeros((1, 128), np.float32)
            attrs = np.zeros((8, 16), np.float32)
            face_map_g = np.full(8, -1, np.int32)
        out['wide_nodes_g'] = jnp.asarray(nodes_g)
        out['wide_tris_g'] = jnp.asarray(tris_g)
        out['wide_attrs'] = jnp.asarray(attrs)
        out['wide_face_map'] = jnp.asarray(face_map_g)
        dirty |= SCENE_DIRTY_GLOBALS

    if dirty & SCENE_DIRTY_CAMERAS:
        cameras = []
        for entity, world in scene.walk_entities_with_transform():
            if entity.type != ENTITY_TYPE_CAMERA:
                continue
            entity.packed_camera_index = len(cameras)
            if entity.camera_model == CAMERA_MODEL_PINHOLE:
                sensor_x = 2.0 * np.tan(np.radians(entity.pinhole.field_of_view_in_degrees / 2))
                cameras.append(dict(
                    model=CAMERA_MODEL_PINHOLE,
                    focal_length=0.0,
                    aperture=entity.pinhole.aperture_diameter_in_mm / 2000.0,
                    sensor_distance=1.0,
                    sensor_size=(sensor_x, sensor_x / aspect_ratio),
                    world=world,
                ))
            elif entity.camera_model == CAMERA_MODEL_THIN_LENS:
                tl = entity.thin_lens
                cameras.append(dict(
                    model=CAMERA_MODEL_THIN_LENS,
                    focal_length=tl.focal_length_in_mm / 1000.0,
                    aperture=tl.aperture_diameter_in_mm / 2000.0,
                    sensor_distance=1.0 / (1000.0 / tl.focal_length_in_mm - 1.0 / tl.focus_distance),
                    sensor_size=tuple(np.asarray(tl.sensor_size_in_mm) / 1000.0),
                    world=world,
                ))
            else:  # 360
                cameras.append(dict(
                    model=entity.camera_model, focal_length=0.0, aperture=0.0,
                    sensor_distance=1.0, sensor_size=(1.0, 1.0), world=world,
                ))
        if not cameras:
            cameras.append(dict(model=CAMERA_MODEL_PINHOLE, focal_length=0.0,
                                aperture=0.0, sensor_distance=1.0,
                                sensor_size=(2.0, 1.0), world=np.eye(4, dtype=np.float32)))
        # Bucket-pad the camera dimension (see _bucket): padded rows
        # are plain defaults, selectable only by an out-of-range
        # camera_index no caller produces.
        while len(cameras) < _bucket(len(cameras)):
            cameras.append(dict(model=CAMERA_MODEL_PINHOLE, focal_length=0.0,
                                aperture=0.0, sensor_distance=1.0,
                                sensor_size=(2.0, 1.0),
                                world=np.eye(4, dtype=np.float32)))
        out.update(
            camera_model=jnp.asarray([c['model'] for c in cameras], jnp.int32),
            camera_focal_length=jnp.asarray([c['focal_length'] for c in cameras], jnp.float32),
            camera_aperture_radius=jnp.asarray([c['aperture'] for c in cameras], jnp.float32),
            camera_sensor_distance=jnp.asarray([c['sensor_distance'] for c in cameras], jnp.float32),
            camera_sensor_size=jnp.asarray([c['sensor_size'] for c in cameras], jnp.float32),
            camera_world_from_camera=jnp.asarray(np.stack([c['world'] for c in cameras])),
        )

    if dirty & SCENE_DIRTY_SKYBOX_TEXTURE:
        skybox = scene.root.skybox_texture
        if skybox is not None and skybox.pixels is not None:
            mean, concentration = _fit_skybox_vmf(np.asarray(skybox.pixels, np.float32))
            out['skybox_mean_direction'] = jnp.asarray(mean)
            out['skybox_concentration'] = jnp.asarray(concentration)
            out['skybox_texture_index'] = jnp.asarray(skybox.packed_texture_index, jnp.int32)
        else:
            out['skybox_mean_direction'] = jnp.asarray([0.0, 0.0, 1.0])
            out['skybox_concentration'] = jnp.asarray(0.0, jnp.float32)
            out['skybox_texture_index'] = jnp.asarray(TEXTURE_INDEX_NONE, jnp.int32)
        dirty |= SCENE_DIRTY_GLOBALS

    if dirty & SCENE_DIRTY_GLOBALS:
        out['skybox_sampling_probability'] = jnp.asarray(
            scene.root.skybox_sampling_probability, jnp.float32)
        out['skybox_brightness'] = jnp.asarray(scene.root.skybox_brightness, jnp.float32)
        out['scene_scatter_rate'] = jnp.asarray(scene.root.scatter_rate, jnp.float32)

    scene.dirty_flags = 0
    packed = PackedScene(**out)

    # Attach host-side metadata so SceneLayout and callers never read
    # device arrays back (a single device->host transfer permanently
    # degrades the TPU runtime's execution mode ~1000x, measured).
    from ..ops.intersect import build_layout_host
    object.__setattr__(packed, 'host_layout', build_layout_host(scene, packed))
    object.__setattr__(packed, 'host_camera_models',
                       tuple(int(np.asarray(c)) for c in
                             [e.camera_model for e in scene.walk_entities()
                              if e.type == ENTITY_TYPE_CAMERA] or [0]))
    return packed
