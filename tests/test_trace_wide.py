"""Wide-BVH packet kernel tests (interpret mode) + end-to-end equality
with the portable traversal on a compiled multi-instance scene."""

import numpy as np
import jax.numpy as jnp
import pytest

from path_tracer_tpu.scene import bvh8
from path_tracer_tpu.ops import trace_wide
from path_tracer_tpu.ops.intersect import SceneLayout, trace
from path_tracer_tpu import compile_scene


def _random_geometry(rng, faces, spread=0.06):
    base = rng.uniform(0, 1, (faces, 1, 3)).astype(np.float32)
    tri = (base + rng.uniform(-spread, spread, (faces, 3, 3))).astype(np.float32)
    nrm = rng.normal(size=(faces, 3, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    uv = rng.uniform(0, 1, (faces, 3, 2)).astype(np.float32)
    shp = rng.integers(0, 5, faces).astype(np.float32)
    return tri, nrm, uv, shp


def _random_rays(rng, n):
    o = rng.uniform(-0.5, 1.5, (3, n)).astype(np.float32)
    d = rng.normal(size=(3, n)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    return o, d


def _brute_force(tri, o, d, t_in):
    p0 = tri[:, 0][:, :, None]
    p1 = tri[:, 1][:, :, None]
    p2 = tri[:, 2][:, :, None]
    e1, e2 = p1 - p0, p2 - p0
    pv = np.cross(d[None], e2, axis=1)
    det = (e1 * pv).sum(1)
    ok = np.abs(det) >= 1e-9
    inv = 1.0 / np.where(ok, det, 1.0)
    s = o[None] - p0
    u = inv * (s * pv).sum(1)
    q = np.cross(s, e1, axis=1)
    v = inv * (d[None] * q).sum(1)
    t = inv * (e2 * q).sum(1)
    ok &= (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
    ok &= (t >= 0) & (t < t_in[None])
    t = np.where(ok, t, np.inf)
    best, bt = t.argmin(0), t.min(0)
    hit = np.isfinite(bt)
    return np.where(hit, bt, t_in), np.where(hit, best, -1)


def test_wide_bvh_face_map_is_permutation():
    rng = np.random.default_rng(3)
    tri, nrm, uv, shp = _random_geometry(rng, 257)
    wide = bvh8.build_wide_bvh(tri, nrm, uv, shp)
    fm = wide.face_map
    assert sorted(fm[fm >= 0].tolist()) == list(range(257))
    # Every leaf block's triangles sit inside the advertised child box.
    meta = wide.nodes[:, bvh8.META_LANE:bvh8.META_LANE + 8]
    for w in range(wide.nodes.shape[0]):
        for c in range(8):
            m = meta[w, c]
            if m >= 0:
                continue
            row = int(-m) % bvh8.LEAF_ROW_LIMIT
            count = int(-m) // bvh8.LEAF_ROW_LIMIT
            lo = np.array([wide.nodes[w, 8 * ax + c] for ax in range(3)])
            hi = np.array([wide.nodes[w, 24 + 8 * ax + c] for ax in range(3)])
            for k in range(count):
                src = fm[row * 4 + k]
                assert src >= 0
                assert (tri[src] >= lo - 1e-4).all()
                assert (tri[src] <= hi + 1e-4).all()


def test_wide_trace_matches_brute_force():
    rng = np.random.default_rng(0)
    tri, nrm, uv, shp = _random_geometry(rng, 300)
    wide = bvh8.build_wide_bvh(tri, nrm, uv, shp)
    n = trace_wide.INTERLEAVE * 1024  # cover every interleaved packet
    o, d = _random_rays(rng, n)
    t_in = np.full(n, 1e5, np.float32)
    bt, bface = _brute_force(tri, o, d, t_in)

    t, face, normal, uvr, shpo = trace_wide.wide_trace(
        jnp.asarray(wide.nodes), jnp.asarray(wide.tris),
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_in),
        interpret=True)
    t, face, shpo = np.asarray(t), np.asarray(face), np.asarray(shpo)

    np.testing.assert_array_equal(face >= 0, bface >= 0)
    m = face >= 0
    np.testing.assert_allclose(t[m], bt[m], rtol=2e-4, atol=2e-5)
    got = wide.face_map[face[m]]
    assert (got == bface[m]).mean() > 0.99  # exact t-ties may reorder
    assert (shpo[m] == shp[got].astype(np.int32)).all()
    # Interpolated normals are unit-ish and match the winning face's lerp.
    nn = np.asarray(normal)[:, m]
    assert np.isfinite(nn).all()


def test_wide_trace_respects_t_in():
    rng = np.random.default_rng(1)
    tri, nrm, uv, shp = _random_geometry(rng, 64, spread=0.2)
    wide = bvh8.build_wide_bvh(tri, nrm, uv, shp)
    o, d = _random_rays(rng, 1024)
    t_full = np.full(1024, 1e5, np.float32)
    t, face, *_ = trace_wide.wide_trace(
        jnp.asarray(wide.nodes), jnp.asarray(wide.tris),
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_full), interpret=True)
    t = np.asarray(t)
    face = np.asarray(face)
    hit = face >= 0
    assert hit.any()
    # Shrink the allowed reach below each found hit: nothing may be found.
    t_small = np.where(hit, t * 0.5, 1e-6).astype(np.float32)
    t2, face2, *_ = trace_wide.wide_trace(
        jnp.asarray(wide.nodes), jnp.asarray(wide.tris),
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_small), interpret=True)
    assert (np.asarray(face2) == -1).all()
    np.testing.assert_array_equal(np.asarray(t2), t_small)


def _small_multi_instance_scene():
    """Two transformed mesh instances (one non-uniformly scaled) plus
    analytic shapes -- small enough for interpret-mode packet tracing."""
    from path_tracer_tpu.core.constants import (
        MATERIAL_TYPE_BASIC_DIFFUSE, MATERIAL_TYPE_BASIC_METAL)
    from path_tracer_tpu.scene.model import (
        ENTITY_TYPE_MESH_INSTANCE, ENTITY_TYPE_PLANE, ENTITY_TYPE_SPHERE,
        Scene, Transform)
    from path_tracer_tpu.scene.procedural import torus, uv_sphere

    scene = Scene()
    p, n, u, f = uv_sphere(16, 8)
    ball = scene.create_mesh(name='ball', positions=p, normals=n, uvs=u, faces=f)
    p, n, u, f = torus(16, 8, 1.2, 0.4)
    ring = scene.create_mesh(name='ring', positions=p, normals=n, uvs=u, faces=f)
    m1 = scene.create_material(MATERIAL_TYPE_BASIC_DIFFUSE, name='m1',
                               base_color=np.asarray([0.7, 0.3, 0.2]))
    m2 = scene.create_material(MATERIAL_TYPE_BASIC_METAL, name='m2',
                               base_color=np.asarray([0.8, 0.8, 0.9]))
    scene.create_entity(ENTITY_TYPE_MESH_INSTANCE, mesh=ball, material=m1,
                        transform=Transform(position=[1.0, 0.5, 0.2],
                                            rotation=[0.3, 0.7, 0.1],
                                            scale=[0.8, 1.4, 0.6]))
    scene.create_entity(ENTITY_TYPE_MESH_INSTANCE, mesh=ring, material=m2,
                        transform=Transform(position=[-1.2, -0.4, 0.8],
                                            rotation=[0.0, 0.4, 1.1],
                                            scale=1.3))
    scene.create_entity(ENTITY_TYPE_PLANE, material=m1,
                        transform=Transform(position=[0, 0, -1.5]))
    scene.create_entity(ENTITY_TYPE_SPHERE, material=m2,
                        transform=Transform(position=[0.2, 2.0, 0.0]))
    return scene


def test_packet_matches_portable_end_to_end():
    """trace(use_packet=True, interpret=True) must agree with the
    portable per-instance traversal on a compiled scene with multiple
    transformed mesh instances + analytic shapes (the wide path bakes
    instances into world space; the portable path traces object space).
    """
    scene = _small_multi_instance_scene()
    packed = compile_scene(scene, aspect_ratio=2.0)
    layout = SceneLayout.from_packed(packed)
    assert layout.instance_slots >= 2

    rng = np.random.default_rng(7)
    n = 1024
    o = rng.uniform(-4, 4, (3, n)).astype(np.float32)
    d = rng.normal(size=(3, n)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)

    hp = trace(packed, layout, jnp.asarray(o), jnp.asarray(d),
               use_packet=True, interpret=True)
    hq = trace(packed, layout, jnp.asarray(o), jnp.asarray(d),
               use_packet=False)

    tp, tq = np.asarray(hp['time']), np.asarray(hq['time'])
    np.testing.assert_allclose(tp, tq, rtol=5e-4, atol=5e-4)
    sp, sq = np.asarray(hp['shape']), np.asarray(hq['shape'])
    agree = (sp == sq).mean()
    assert agree > 0.995, agree  # near-coincident surfaces may tie
    from path_tracer_tpu.core.constants import SHAPE_INDEX_NONE
    same = (sp == sq) & (sp != SHAPE_INDEX_NONE)  # attrs defined on hits only
    assert same.sum() > 300
    for key, tol in (('normal', 2e-2), ('uv', 2e-2), ('position', 1e-3)):
        a = np.asarray(hp[key])[..., same]
        b = np.asarray(hq[key])[..., same]
        # Rays grazing shared triangle edges may resolve to either face
        # (t-tie) with different lerped attributes; allow a 0.5% tail.
        frac = (np.abs(a - b) <= tol).mean()
        assert frac >= 0.995, (key, frac)
    mat_same = (np.asarray(hp['material']) == np.asarray(hq['material']))[same]
    assert mat_same.all()


def test_sorted_trace_matches_unsorted():
    """trace(sort_packets=True) permutes kernel inputs into coherence
    order and inverse-permutes the outputs; per-lane results must match
    the unsorted kernel up to traversal tie-breaks (packet composition
    changes node visit order, so equal-t faces may swap)."""
    scene = _small_multi_instance_scene()
    packed = compile_scene(scene, aspect_ratio=2.0)
    layout = SceneLayout.from_packed(packed)

    rng = np.random.default_rng(11)
    n = 1024
    o = rng.uniform(-4, 4, (3, n)).astype(np.float32)
    d = rng.normal(size=(3, n)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)

    hs = trace(packed, layout, jnp.asarray(o), jnp.asarray(d),
               use_packet=True, interpret=True, sort_packets=True)
    hu = trace(packed, layout, jnp.asarray(o), jnp.asarray(d),
               use_packet=True, interpret=True, sort_packets=False)

    np.testing.assert_allclose(np.asarray(hs['time']),
                               np.asarray(hu['time']), rtol=1e-5, atol=1e-5)
    agree = (np.asarray(hs['shape']) == np.asarray(hu['shape'])).mean()
    assert agree > 0.995, agree
    same = np.asarray(hs['shape']) == np.asarray(hu['shape'])
    for key in ('normal', 'uv', 'material'):
        a = np.asarray(hs[key])[..., same]
        b = np.asarray(hu[key])[..., same]
        frac = (np.abs(a - b) <= 1e-5).mean()
        assert frac >= 0.995, (key, frac)

    # The block-quantized permutation (a measured perf negative kept as
    # a measurement knob, tools/exp_blocksort.py) must stay an exact
    # roundtrip: block-sorted results match the unsorted kernel too.
    hb = trace(packed, layout, jnp.asarray(o), jnp.asarray(d),
               use_packet=True, interpret=True, sort_packets=True,
               sort_block=32)
    np.testing.assert_allclose(np.asarray(hb['time']),
                               np.asarray(hu['time']), rtol=1e-5, atol=1e-5)
    agree = (np.asarray(hb['shape']) == np.asarray(hu['shape'])).mean()
    assert agree > 0.995, agree


def test_wide_trace5_matches_brute_force():
    """The v5 (splat + geometry-only leaf) kernel must reproduce brute
    force, and its gathered-attribute resolve must match v3's in-kernel
    lerp."""
    from path_tracer_tpu.ops import trace_packet

    rng = np.random.default_rng(5)
    tri, nrm, uv, shp = _random_geometry(rng, 300)
    wide = bvh8.build_wide_bvh(tri, nrm, uv, shp)
    nodes_g, tris_g, attrs, face_map_g = bvh8.pack_wide_geom(
        wide, tri, nrm, uv, shp)
    fm = face_map_g
    assert sorted(fm[fm >= 0].tolist()) == list(range(300))

    n = 2048
    o, d = _random_rays(rng, n)
    t_in = np.full(n, 1e5, np.float32)
    bt, bface = _brute_force(tri, o, d, t_in)

    t3, f3, n3, uv3, s3 = trace_wide.wide_trace(
        jnp.asarray(wide.nodes), jnp.asarray(wide.tris),
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_in), interpret=True)
    t5, f5, fu5, fv5 = trace_packet.wide_trace5(
        jnp.asarray(nodes_g), jnp.asarray(tris_g),
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_in), interpret=True)
    n5, uv5, s5 = trace_packet.resolve_wide_attributes(
        jnp.asarray(attrs), f5, fu5, fv5)

    t5, f5, s5 = np.asarray(t5), np.asarray(f5), np.asarray(s5)
    np.testing.assert_array_equal(f5 >= 0, bface >= 0)
    m = f5 >= 0
    np.testing.assert_allclose(t5[m], bt[m], rtol=2e-4, atol=2e-5)
    got = face_map_g[f5[m]]
    assert (got == bface[m]).mean() > 0.99
    assert (s5[m] == shp[got].astype(np.int32)).all()
    # Same-face winners must agree with v3's in-kernel attribute lerp.
    same = m & (wide.face_map[np.asarray(f3)] == face_map_g[f5])
    assert same[m].mean() > 0.98
    np.testing.assert_allclose(np.asarray(n5)[:, same],
                               np.asarray(n3)[:, same], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(uv5)[:, same],
                               np.asarray(uv3)[:, same], rtol=1e-3, atol=1e-4)


def test_leaf_meta_f32_exact_at_large_rows():
    """The leaf meta encoding must survive the float32 node lane for
    every in-range (row, count): the old -(row*64+count) layout rounded
    away count bits beyond row 262143 (a real 1.6M-triangle scene),
    which corrupted ~1.4% of leaves silently."""
    import numpy as np

    rows = np.array([0, 1, 262143, 262144, 500000,
                     bvh8.LEAF_ROW_LIMIT - 1], np.int64)
    for count in (1, 7, 8, 9, bvh8.LEAF_MAX):
        meta = np.float32(-(count * bvh8.LEAF_ROW_LIMIT + rows))
        u = (-meta).astype(np.int64)
        np.testing.assert_array_equal(u % bvh8.LEAF_ROW_LIMIT, rows)
        np.testing.assert_array_equal(u // bvh8.LEAF_ROW_LIMIT, count)
