"""Ray-scene intersection: analytic primitives, triangles, BVH traversal.

TPU-native trace stage. Behavioral reference:
/root/reference/src/scene/scene.glsl.inc:304-611 (Moller-Trumbore,
stackless-stack BVH walk, analytic plane/sphere/cube in object space,
hit attribute resolution). The design differs from the SIMT original
where it matters for TPU:

  * Analytic shapes are intersected as a dense (N_rays, S_shapes)
    broadcast batch -- no gathers at all; the winner is an argmin.
  * Mesh instances are traced one instance at a time (a static Python
    loop over the compile-time instance list), each as a vectorized
    BVH2 traversal over all rays with a per-lane traversal stack.
    The object->world matrices enter as statically-indexed slices, so
    lanes never gather transforms.
  * Leaf face intersection is unrolled to a compile-time maximum
    (the builder caps leaf size), keeping every loop bound static.

Hit state is a dict of SoA arrays over rays.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.constants import (
    EPSILON,
    HIT_TIME_LIMIT,
    INFINITY,
    PI,
    SHAPE_INDEX_NONE,
    SHAPE_TYPE_CUBE,
    SHAPE_TYPE_MESH_INSTANCE,
    SHAPE_TYPE_PLANE,
    SHAPE_TYPE_SPHERE,
    TAU,
)
from ..core.sampling import compute_tangent_vector, normalize, safe_normalize

MAX_LEAF_FACES = 4
STACK_DEPTH = 48


@dataclass(frozen=True)
class SceneLayout:
    """Static (hashable) compile-time scene structure.

    Carried alongside PackedScene through jit boundaries; controls the
    unrolling of the trace stage. Rebuilt whenever the set of shapes
    changes (cheap; jit caches previous layouts).
    """

    analytic_shapes: Tuple[Tuple[int, int], ...]  # (shape_index, shape_type)
    mesh_instances: Tuple[Tuple[int, int], ...]   # (shape_index, root_node)
    num_shapes: int

    @staticmethod
    def from_packed(packed):
        shape_type = np.asarray(packed.shape_type)
        mesh_root = np.asarray(packed.shape_mesh_root)
        analytic, meshes = [], []
        for i, t in enumerate(shape_type):
            if t == SHAPE_TYPE_MESH_INSTANCE:
                meshes.append((i, int(mesh_root[i])))
            else:
                analytic.append((i, int(t)))
        return SceneLayout(tuple(analytic), tuple(meshes), len(shape_type))


def make_hit(n, duration):
    """Fresh hit record SoA (scene.glsl.inc:522-528)."""
    return dict(
        time=jnp.broadcast_to(jnp.asarray(duration, jnp.float32), (n,)),
        shape=jnp.full((n,), SHAPE_INDEX_NONE, jnp.int32),
        shape_type=jnp.zeros((n,), jnp.int32),
        primitive=jnp.zeros((n,), jnp.int32),
        # Shape-dependent primitive coordinates (barycentrics / local pos).
        coords=jnp.zeros((n, 3), jnp.float32),
    )


def transform_rays(origin, direction, matrix):
    """Apply a 4x4 matrix to ray origins (as points) and directions (as
    vectors). matrix: (4, 4) or broadcastable batch."""
    rot = matrix[..., :3, :3]
    o = jnp.einsum('...ij,nj->ni', rot, origin) + matrix[..., :3, 3]
    d = jnp.einsum('...ij,nj->ni', rot, direction)
    return o, d


def intersect_aabb(origin, inv_dir, reach, lo, hi):
    """Slab test (common.glsl.inc:153-185). Broadcasts over any batch.

    Returns entry time, INFINITY on miss/occluded.
    """
    t0 = (lo - origin) * inv_dir
    t1 = (hi - origin) * inv_dir
    earlier = jnp.minimum(t0, t1)
    later = jnp.maximum(t0, t1)
    entry = jnp.max(earlier, axis=-1)
    exit_ = jnp.min(later, axis=-1)
    miss = (exit_ < entry) | (exit_ <= 0.0) | (entry >= reach)
    return jnp.where(miss, INFINITY, entry)


def moller_trumbore(origin, direction, p0, p1, p2, t_max):
    """Watertight-enough Moller-Trumbore (scene.glsl.inc:304-334).

    All inputs broadcast; returns (t, u, v, valid).
    """
    e1 = p1 - p0
    e2 = p2 - p0
    pvec = jnp.cross(direction, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    valid = jnp.abs(det) >= EPSILON
    inv_det = 1.0 / jnp.where(valid, det, 1.0)
    s = origin - p0
    u = inv_det * jnp.sum(s * pvec, axis=-1)
    qvec = jnp.cross(s, e1)
    v = inv_det * jnp.sum(direction * qvec, axis=-1)
    t = inv_det * jnp.sum(e2 * qvec, axis=-1)
    valid &= (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
    valid &= (t >= 0.0) & (t <= t_max)
    return t, u, v, valid


# --- Analytic primitives (object space, scene.glsl.inc:401-466) ----------


def _intersect_plane(o, d, reach):
    dz = jnp.where(jnp.abs(d[..., 2]) < 1e-12, 1e-12, d[..., 2])
    t = -o[..., 2] / dz
    hit = (t >= 0.0) & (t <= reach)
    return jnp.where(hit, t, INFINITY)


def _intersect_sphere(o, d, reach):
    v = jnp.sum(d * d, axis=-1)
    p = jnp.sum(o * d, axis=-1)
    q = jnp.sum(o * o, axis=-1) - 1.0
    d2 = p * p - q * v
    ok = d2 >= 0.0
    sq = jnp.sqrt(jnp.maximum(d2, 0.0))
    ok &= sq >= p
    s0 = -p - sq
    s1 = -p + sq
    s = jnp.where(s0 < 0.0, s1, s0)
    ok &= (s >= 0.0) & (s <= v * reach)
    return jnp.where(ok, s / jnp.maximum(v, 1e-20), INFINITY)


def _intersect_cube(o, d, reach):
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    t0 = (-1.0 - o) * inv
    t1 = (+1.0 - o) * inv
    earlier = jnp.minimum(t0, t1)
    later = jnp.maximum(t0, t1)
    entry = jnp.max(earlier, axis=-1)
    exit_ = jnp.min(later, axis=-1)
    t = jnp.where(entry < 0.0, exit_, entry)
    ok = (exit_ >= entry) & (exit_ > 0.0) & (t < reach)
    return jnp.where(ok, t, INFINITY)


def intersect_analytic(packed, layout: SceneLayout, origin, direction, hit):
    """Intersect all analytic shapes as one broadcast batch and merge.

    Builds (N, S_analytic) hit-time matrices via object-space transforms;
    no per-lane gathers except the final (N,) winner lookups into
    S_analytic-sized constant tables.
    """
    if not layout.analytic_shapes:
        return hit
    idx = np.asarray([i for i, _ in layout.analytic_shapes], np.int32)
    types = np.asarray([t for _, t in layout.analytic_shapes], np.int32)

    from_world = packed.shape_object_from_world[jnp.asarray(idx)]  # (S,4,4)
    rot = from_world[:, :3, :3]
    # (S, N, 3) object-space rays.
    o = jnp.einsum('sij,nj->sni', rot, origin) + from_world[:, None, :3, 3]
    d = jnp.einsum('sij,nj->sni', rot, direction)

    reach = hit['time'][None, :]
    t_plane = _intersect_plane(o, d, reach)
    t_sphere = _intersect_sphere(o, d, reach)
    t_cube = _intersect_cube(o, d, reach)

    types_j = jnp.asarray(types)[:, None]
    t = jnp.where(types_j == SHAPE_TYPE_PLANE, t_plane,
                  jnp.where(types_j == SHAPE_TYPE_SPHERE, t_sphere, t_cube))  # (S, N)

    best = jnp.argmin(t, axis=0)                      # (N,)
    best_t = jnp.take_along_axis(t, best[None, :], axis=0)[0]
    improved = best_t < hit['time']

    # Local hit position of the winning shape.
    bo = jnp.take_along_axis(o, best[None, :, None], axis=0)[0]
    bd = jnp.take_along_axis(d, best[None, :, None], axis=0)[0]
    local = bo + bd * best_t[:, None]

    shape_idx = jnp.asarray(idx)[best]
    shape_type = jnp.asarray(types)[best]

    return dict(
        time=jnp.where(improved, best_t, hit['time']),
        shape=jnp.where(improved, shape_idx, hit['shape']),
        shape_type=jnp.where(improved, shape_type, hit['shape_type']),
        primitive=jnp.where(improved, 0, hit['primitive']),
        coords=jnp.where(improved[:, None], local, hit['coords']),
    )


# --- Mesh BVH traversal ----------------------------------------------------


def traverse_mesh_bvh(packed, root: int, origin, direction, hit, shape_index: int):
    """Vectorized BVH2 traversal of one mesh instance over all rays.

    Follows the reference's near-child-first two-fetch scheme
    (scene.glsl.inc:336-399) with an explicit (N, STACK_DEPTH) stack.
    origin/direction are already in mesh object space. Loop bounds are
    static; lanes run until every lane's stack is exhausted.
    """
    n = origin.shape[0]
    inv_dir = 1.0 / jnp.where(jnp.abs(direction) < 1e-12, 1e-12, direction)

    node_min = packed.mesh_node_min
    node_max = packed.mesh_node_max
    node_a = packed.mesh_node_a
    node_b = packed.mesh_node_b
    face_pos = packed.face_positions

    # Prune rays that miss the root bounding box entirely.
    root_entry = intersect_aabb(origin, inv_dir, hit['time'],
                                node_min[root], node_max[root])
    start = jnp.where(root_entry < INFINITY, jnp.int32(root), jnp.int32(-1))

    state = dict(
        node=start,
        stack=jnp.zeros((n, STACK_DEPTH), jnp.int32),
        depth=jnp.zeros((n,), jnp.int32),
        time=hit['time'],
        primitive=hit['primitive'],
        u=hit['coords'][:, 1],
        v=hit['coords'][:, 2],
        found=jnp.zeros((n,), jnp.bool_),
    )

    lane = jnp.arange(n)

    def cond(state):
        return jnp.any((state['node'] >= 0) | (state['depth'] > 0))

    def body(state):
        node, stack, depth = state['node'], state['stack'], state['depth']

        # Pop for lanes with no current node.
        need_pop = (node < 0) & (depth > 0)
        depth = jnp.where(need_pop, depth - 1, depth)
        pop_idx = jnp.clip(depth, 0, STACK_DEPTH - 1)
        popped = jnp.take_along_axis(stack, pop_idx[:, None], axis=1)[:, 0]
        node = jnp.where(need_pop, popped, node)

        active = node >= 0
        safe_node = jnp.maximum(node, 0)

        a = node_a[safe_node]
        b = node_b[safe_node]
        is_leaf = active & (b > 0)
        is_internal = active & (b == 0)

        time = state['time']
        primitive, u, v, found = state['primitive'], state['u'], state['v'], state['found']

        # Leaf: unrolled masked face tests.
        for k in range(MAX_LEAF_FACES):
            face = a + k
            face_ok = is_leaf & (face < b)
            safe_face = jnp.where(face_ok, face, 0)
            p = face_pos[safe_face]  # (N, 3, 3)
            t, fu, fv, valid = moller_trumbore(
                origin, direction, p[:, 0], p[:, 1], p[:, 2], time)
            take = face_ok & valid & (t < time)
            time = jnp.where(take, t, time)
            primitive = jnp.where(take, safe_face, primitive)
            u = jnp.where(take, fu, u)
            v = jnp.where(take, fv, v)
            found = found | take

        # Internal: fetch both children, near-first, push far.
        child_a = jnp.where(is_internal, a, 0)
        child_b = child_a + 1
        ta = jnp.where(
            is_internal,
            intersect_aabb(origin, inv_dir, time, node_min[child_a], node_max[child_a]),
            INFINITY)
        tb = jnp.where(
            is_internal,
            intersect_aabb(origin, inv_dir, time, node_min[child_b], node_max[child_b]),
            INFINITY)

        near = jnp.where(ta <= tb, child_a, child_b)
        far = jnp.where(ta <= tb, child_b, child_a)
        t_near = jnp.minimum(ta, tb)
        t_far = jnp.maximum(ta, tb)

        next_node = jnp.where(is_internal & (t_near < INFINITY), near, jnp.int32(-1))
        push = is_internal & (t_far < INFINITY) & (t_near < INFINITY) & (depth < STACK_DEPTH)
        stack = stack.at[lane, jnp.minimum(depth, STACK_DEPTH - 1)].set(
            jnp.where(push, far, stack[lane, jnp.minimum(depth, STACK_DEPTH - 1)]))
        depth = jnp.where(push, depth + 1, depth)
        # Only-far-hit case: go directly to far child.
        only_far = is_internal & (t_near == INFINITY) & (t_far < INFINITY)
        next_node = jnp.where(only_far, far, next_node)

        node = jnp.where(active, next_node, node)

        return dict(node=node, stack=stack, depth=depth, time=time,
                    primitive=primitive, u=u, v=v, found=found)

    state = jax.lax.while_loop(cond, body, state)

    improved = state['found']
    coords = jnp.stack([1.0 - state['u'] - state['v'], state['u'], state['v']], axis=-1)
    return dict(
        time=jnp.where(improved, state['time'], hit['time']),
        shape=jnp.where(improved, shape_index, hit['shape']),
        shape_type=jnp.where(improved, SHAPE_TYPE_MESH_INSTANCE, hit['shape_type']),
        primitive=jnp.where(improved, state['primitive'], hit['primitive']),
        coords=jnp.where(improved[:, None], coords, hit['coords']),
    )


def resolve_hit_attributes(packed, layout: SceneLayout, origin, direction, hit):
    """Compute world normal, tangent frame, UV and material of each hit.

    Equivalent of the attribute-resolution tail of Trace()
    (scene.glsl.inc:532-611). Transform handling: analytic normals are
    generated inside each shape's static pass to avoid matrix gathers is
    not possible post-reduction, so the winning shape's matrices are
    gathered once per lane here (a small-table gather).
    """
    n = origin.shape[0]
    shape = hit['shape']
    valid = shape != SHAPE_INDEX_NONE
    safe_shape = jnp.where(valid, shape, 0)

    to_world = packed.shape_world_from_object[safe_shape]    # (N, 4, 4)
    from_world = packed.shape_object_from_world[safe_shape]  # (N, 4, 4)
    material = packed.shape_material[safe_shape]

    coords = hit['coords']
    stype = hit['shape_type']

    # --- mesh: barycentric-interpolated vertex attributes -----------------
    prim = hit['primitive']
    fv = packed.face_vertices[prim]          # (N, 3)
    n0 = packed.vertex_normals[fv[:, 0]]
    n1 = packed.vertex_normals[fv[:, 1]]
    n2 = packed.vertex_normals[fv[:, 2]]
    mesh_normal_obj = safe_normalize(
        n0 * coords[:, 0:1] + n1 * coords[:, 1:2] + n2 * coords[:, 2:3])
    uv0 = packed.vertex_uvs[fv[:, 0]]
    uv1 = packed.vertex_uvs[fv[:, 1]]
    uv2 = packed.vertex_uvs[fv[:, 2]]
    mesh_uv = uv0 * coords[:, 0:1] + uv1 * coords[:, 1:2] + uv2 * coords[:, 2:3]

    # --- analytic normals in object space ----------------------------------
    plane_normal_obj = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    sphere_normal_obj = coords
    q = jnp.abs(coords)
    cube_axis_x = (q[:, 0] >= q[:, 1]) & (q[:, 0] >= q[:, 2])
    cube_axis_y = ~cube_axis_x & (q[:, 1] >= q[:, 0]) & (q[:, 1] >= q[:, 2])
    sx = jnp.sign(coords[:, 0])
    sy = jnp.sign(coords[:, 1])
    sz = jnp.sign(coords[:, 2])
    zeros = jnp.zeros(n)
    cube_normal_obj = jnp.where(
        cube_axis_x[:, None], jnp.stack([sx, zeros, zeros], -1),
        jnp.where(cube_axis_y[:, None], jnp.stack([zeros, sy, zeros], -1),
                  jnp.stack([zeros, zeros, sz], -1)))

    normal_obj = jnp.where(
        (stype == SHAPE_TYPE_MESH_INSTANCE)[:, None], mesh_normal_obj,
        jnp.where((stype == SHAPE_TYPE_PLANE)[:, None], plane_normal_obj,
                  jnp.where((stype == SHAPE_TYPE_SPHERE)[:, None], sphere_normal_obj,
                            cube_normal_obj)))

    # Normal transform: normalize(N^T * from_world) (common.glsl.inc:50-53).
    normal = safe_normalize(jnp.einsum('nj,nji->ni', normal_obj, from_world[:, :3, :3]))

    # Tangents (scene.glsl.inc:555, :563, :573, :584-604).
    mesh_tangent = compute_tangent_vector(normal)
    plane_tangent_obj = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (n, 3))
    p = coords
    sphere_tangent_obj = jnp.cross(p, jnp.stack([-p[:, 1], p[:, 0], zeros], -1))
    cube_tangent_obj = jnp.where(
        cube_axis_x[:, None], jnp.stack([zeros, sx, zeros], -1),
        jnp.where(cube_axis_y[:, None], jnp.stack([zeros, zeros, sy], -1),
                  jnp.stack([sz, zeros, zeros], -1)))
    analytic_tangent_obj = jnp.where(
        (stype == SHAPE_TYPE_PLANE)[:, None], plane_tangent_obj,
        jnp.where((stype == SHAPE_TYPE_SPHERE)[:, None], sphere_tangent_obj,
                  cube_tangent_obj))
    analytic_tangent = safe_normalize(
        jnp.einsum('nij,nj->ni', to_world[:, :3, :3], analytic_tangent_obj))
    tangent = jnp.where((stype == SHAPE_TYPE_MESH_INSTANCE)[:, None],
                        mesh_tangent, analytic_tangent)
    bitangent = jnp.cross(normal, tangent)
    # Re-orthogonalize the frame (tangent might not be exactly orthogonal
    # to the transformed normal under non-uniform scale).
    tangent = jnp.cross(bitangent, normal)
    tangent = safe_normalize(tangent)
    bitangent = jnp.cross(normal, tangent)

    # UV per shape type.
    plane_uv = coords[:, :2] - jnp.floor(coords[:, :2])
    sphere_uv = jnp.stack([
        (jnp.arctan2(p[:, 1], p[:, 0]) + PI) / TAU,
        (p[:, 2] + 1.0) * 0.5,
    ], -1)
    cube_uv = jnp.where(
        cube_axis_x[:, None], 0.5 * (1.0 + coords[:, 1:3]),
        jnp.where(cube_axis_y[:, None],
                  0.5 * (1.0 + jnp.stack([coords[:, 0], coords[:, 2]], -1)),
                  0.5 * (1.0 + coords[:, 0:2])))
    uv = jnp.where((stype == SHAPE_TYPE_MESH_INSTANCE)[:, None], mesh_uv,
                   jnp.where((stype == SHAPE_TYPE_PLANE)[:, None], plane_uv,
                             jnp.where((stype == SHAPE_TYPE_SPHERE)[:, None],
                                       sphere_uv, cube_uv)))

    position = origin + direction * hit['time'][:, None]

    return dict(
        time=hit['time'],
        shape=hit['shape'],
        shape_type=stype,
        primitive=hit['primitive'],
        material=jnp.where(valid, material, 0),
        position=position,
        normal=normal,
        tangent=tangent,
        bitangent=bitangent,
        uv=uv,
    )


def trace(packed, layout: SceneLayout, origin, direction, duration=HIT_TIME_LIMIT):
    """Full trace: intersect every shape, resolve hit attributes.

    Returns the resolved hit SoA dict. Lanes that hit nothing have
    shape == SHAPE_INDEX_NONE and time == duration.
    """
    n = origin.shape[0]
    hit = make_hit(n, duration)
    hit = intersect_analytic(packed, layout, origin, direction, hit)
    for shape_index, root in layout.mesh_instances:
        from_world = packed.shape_object_from_world[shape_index]
        o, d = transform_rays(origin, direction, from_world)
        hit = traverse_mesh_bvh(packed, root, o, d, hit, shape_index)
    return resolve_hit_attributes(packed, layout, origin, direction, hit)
