"""Trace-stage correctness: BVH traversal vs brute force, analytics.

Channels-first: rays are (3, N); packed tables have the gather axis last.
"""

import numpy as np
import jax.numpy as jnp

from path_tracer_tpu.core.constants import (
    HIT_TIME_LIMIT,
    MATERIAL_TYPE_BASIC_DIFFUSE,
    SHAPE_INDEX_NONE,
)
from path_tracer_tpu.ops.intersect import SceneLayout, trace
from path_tracer_tpu.scene.bvh import build_bvh, validate_bvh
from path_tracer_tpu.scene.compile import compile_scene
from path_tracer_tpu.scene.model import (
    ENTITY_TYPE_MESH_INSTANCE,
    ENTITY_TYPE_SPHERE,
    Scene,
    Transform,
)
from path_tracer_tpu.scene.procedural import torus, uv_sphere


def _mesh_scene(part, transform=None):
    scene = Scene()
    p, n, u, f = part
    mesh = scene.create_mesh(name='m', positions=p, normals=n, uvs=u, faces=f)
    mat = scene.create_material(MATERIAL_TYPE_BASIC_DIFFUSE)
    scene.create_entity(ENTITY_TYPE_MESH_INSTANCE, mesh=mesh, material=mat,
                        transform=transform or Transform())
    return scene


def _random_rays(n, seed, spread=4.0):
    rs = np.random.RandomState(seed)
    origin = rs.randn(3, n).astype(np.float32) * spread
    target = rs.randn(3, n).astype(np.float32) * 0.5
    direction = target - origin
    direction /= np.linalg.norm(direction, axis=0, keepdims=True)
    return jnp.asarray(origin), jnp.asarray(direction)


def _brute_force_t(packed, origin, direction):
    """Reference: closest triangle hit over all faces, plain numpy."""
    fp = np.asarray(packed.face_positions)        # (3 verts, 3 comps, F)
    p0 = fp[0].T[None]                            # (1, F, 3)
    p1 = fp[1].T[None]
    p2 = fp[2].T[None]
    o = np.asarray(origin).T[:, None, :]          # (N, 1, 3)
    d = np.asarray(direction).T[:, None, :]
    e1 = p1 - p0
    e2 = p2 - p0
    pvec = np.cross(d, e2)
    det = (e1 * pvec).sum(-1)
    ok = np.abs(det) >= 1e-9
    inv = 1.0 / np.where(ok, det, 1.0)
    s = o - p0
    u = inv * (s * pvec).sum(-1)
    qvec = np.cross(s, e1)
    v = inv * (d * qvec).sum(-1)
    t = inv * (e2 * qvec).sum(-1)
    ok &= (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t >= 0)
    t = np.where(ok, t, np.inf)
    return t.min(axis=1)


def test_bvh_traversal_matches_brute_force():
    scene = _mesh_scene(torus(24, 12))
    packed = compile_scene(scene)
    layout = SceneLayout.from_packed(packed)
    origin, direction = _random_rays(256, seed=1)
    hit = trace(packed, layout, origin, direction)
    t_bvh = np.where(np.asarray(hit['shape']) == SHAPE_INDEX_NONE, np.inf,
                     np.asarray(hit['time']))
    t_ref = _brute_force_t(packed, origin, direction)
    np.testing.assert_allclose(t_bvh, t_ref, rtol=1e-4, atol=1e-5)


def test_bvh_traversal_with_instance_transform():
    tf = Transform(position=[1.0, -2.0, 0.5], rotation=[0.3, 0.7, -0.2],
                   scale=[0.5, 2.0, 1.0], scale_is_uniform=False)
    scene = _mesh_scene(uv_sphere(16, 8), transform=tf)
    packed = compile_scene(scene)
    layout = SceneLayout.from_packed(packed)
    origin, direction = _random_rays(256, seed=2)
    hit = trace(packed, layout, origin, direction)

    # Brute force in object space: transform rays, compare the *world* t
    # (velocity-scaled parameterization keeps t consistent across spaces).
    from_world = np.asarray(packed.shape_object_from_world[:, :, 0])
    o = from_world[:3, :3] @ np.asarray(origin) + from_world[:3, 3:4]
    d = from_world[:3, :3] @ np.asarray(direction)
    t_ref = _brute_force_t(packed, o, d)
    t_bvh = np.where(np.asarray(hit['shape']) == SHAPE_INDEX_NONE, np.inf,
                     np.asarray(hit['time']))
    np.testing.assert_allclose(t_bvh, t_ref, rtol=1e-4, atol=1e-5)


def test_bvh_properties_on_meshes():
    for part in (torus(32, 16), uv_sphere(32, 16)):
        p, n, u, f = part
        tris = p[f]
        bvh = build_bvh(tris)
        assert validate_bvh(bvh, tris) == []
        # Leaf cap respected.
        leaf = bvh.b > 0
        assert ((bvh.b - bvh.a)[leaf] <= 4).all()


def test_sphere_normal_and_uv():
    scene = Scene()
    mat = scene.create_material(MATERIAL_TYPE_BASIC_DIFFUSE)
    scene.create_entity(ENTITY_TYPE_SPHERE, material=mat,
                        transform=Transform(position=[0, 0, 0], scale=2.0))
    packed = compile_scene(scene)
    layout = SceneLayout.from_packed(packed)
    origin = jnp.asarray([[0.0], [-5.0], [0.0]])
    direction = jnp.asarray([[0.0], [1.0], [0.0]])
    hit = trace(packed, layout, origin, direction)
    assert np.isclose(float(hit['time'][0]), 3.0, atol=1e-4)  # radius 2
    np.testing.assert_allclose(np.asarray(hit['normal'][:, 0]), [0, -1, 0],
                               atol=1e-4)
    # Tangent frame is orthonormal.
    t = np.asarray(hit['tangent'][:, 0])
    b = np.asarray(hit['bitangent'][:, 0])
    nrm = np.asarray(hit['normal'][:, 0])
    assert abs(t @ nrm) < 1e-5 and abs(b @ nrm) < 1e-5 and abs(t @ b) < 1e-5


def test_mesh_wins_over_analytic_when_closer():
    scene = _mesh_scene(uv_sphere(16, 8))  # unit sphere mesh at origin
    mat = scene.materials[0]
    scene.create_entity(ENTITY_TYPE_SPHERE, material=mat,
                        transform=Transform(position=[0, 3.0, 0]))
    packed = compile_scene(scene)
    layout = SceneLayout.from_packed(packed)
    origin = jnp.asarray([[0.0], [-5.0], [0.0]])
    direction = jnp.asarray([[0.0], [1.0], [0.0]])
    hit = trace(packed, layout, origin, direction)
    # The mesh sphere at origin (t=4) should win over the analytic at t=7.
    assert np.isclose(float(hit['time'][0]), 4.0, atol=0.05)
    assert int(hit['shape'][0]) == 0
