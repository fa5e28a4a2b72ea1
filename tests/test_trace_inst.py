"""v6 two-level instanced packet kernel (ops/trace_inst.py).

Covers VERDICT round-2 item 5: N instances of one mesh must cost
O(mesh) table bytes, trace identically to the portable per-lane
traversal, and flow through the full integrator.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from path_tracer_tpu.ops import trace_inst
from path_tracer_tpu.ops.intersect import SceneLayout, trace
from path_tracer_tpu.scene import compile as compile_mod
from path_tracer_tpu.scene.model import (
    ENTITY_TYPE_CAMERA, ENTITY_TYPE_MESH_INSTANCE, Scene)


def _blob_mesh(scene, rng, faces=48, verts=40):
    pos = rng.normal(0, 1, (verts, 3)).astype(np.float32)
    f = rng.integers(0, verts, (faces, 3)).astype(np.int32)
    nrm = rng.normal(0, 1, (verts, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    uv = rng.uniform(0, 1, (verts, 2)).astype(np.float32)
    return scene.create_mesh(name='blob', positions=pos, normals=nrm,
                             uvs=uv, faces=f)


def _instanced_scene(n_instances, seed=7):
    rng = np.random.default_rng(seed)
    scene = Scene()
    mesh = _blob_mesh(scene, rng)
    scene.create_entity(ENTITY_TYPE_CAMERA)
    material = scene.create_material(1)
    for _ in range(n_instances):
        e = scene.create_entity(ENTITY_TYPE_MESH_INSTANCE, mesh=mesh,
                                material=material)
        e.transform.position = rng.uniform(-4, 4, 3).astype(np.float32)
        e.transform.rotation = rng.uniform(0, 6.28, 3).astype(np.float32)
        e.transform.scale = (np.float32(rng.uniform(0.5, 2.0))
                             * np.ones(3, np.float32))
    return scene, rng


def test_inst_tables_cost_o_mesh():
    """N instances of one mesh share its object-space tables: the node
    and triangle tables must not grow with N (only the per-instance
    rows and the TLAS do)."""
    sizes = {}
    for n in (4, 16):
        packed = compile_mod.compile_scene(_instanced_scene(n)[0])
        assert packed.host_layout.packet_mode == 'inst'
        sizes[n] = (int(packed.inst_tris.shape[0]),
                    int(packed.inst_nodes.shape[0]
                        - packed.host_layout.tlas_rows),
                    int(packed.inst_rows.shape[0]))
    assert sizes[4][0] == sizes[16][0]       # geometry rows identical
    assert sizes[4][1] == sizes[16][1]       # mesh nodes identical
    assert sizes[4][2] == 4 and sizes[16][2] == 16


@pytest.mark.parametrize('leaf_fmt', ['mt', 'bary'])
def test_inst_trace_matches_portable(leaf_fmt, monkeypatch):
    """The v6 kernel (interpret mode) must reproduce the portable
    traversal's hits through the full trace() resolve on a
    multi-instance transformed scene -- for every leaf geometry
    format (the tables and kernel branch must agree per format)."""
    from path_tracer_tpu.scene import bvh8
    monkeypatch.setattr(bvh8, 'LEAF_FMT', leaf_fmt)
    scene, rng = _instanced_scene(6)
    packed = compile_mod.compile_scene(scene)
    layout = SceneLayout.from_packed(packed)
    assert layout.packet_mode == 'inst' and layout.inst_fit

    n = 1024
    o = jnp.asarray(rng.uniform(-6, 6, (3, n)).astype(np.float32))
    d = rng.normal(0, 1, (3, n)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    d = jnp.asarray(d)

    hp = trace(packed, layout, o, d, use_packet=True, interpret=True)
    hq = trace(packed, layout, o, d, use_packet=False)

    from path_tracer_tpu.core.constants import SHAPE_INDEX_NONE
    same_hit = np.asarray(hp['shape']) == np.asarray(hq['shape'])
    assert same_hit.mean() > 0.995           # t-ties on shared edges
    m = same_hit & (np.asarray(hq['shape']) != SHAPE_INDEX_NONE)
    assert m.sum() > 30
    np.testing.assert_allclose(np.asarray(hp['time'])[m],
                               np.asarray(hq['time'])[m],
                               rtol=5e-4, atol=5e-4)
    for key, tol in (('normal', 2e-2), ('uv', 2e-2), ('position', 1e-3)):
        a = np.asarray(hp[key])[..., m]
        b = np.asarray(hq[key])[..., m]
        frac = (np.abs(a - b) <= tol).mean()
        assert frac >= 0.995, (key, frac)
    assert (np.asarray(hp['material']) == np.asarray(hq['material']))[m].all()


def test_inst_render_end_to_end():
    """A full wavefront render of an instanced scene must run through
    the v6 path and produce finite output."""
    from path_tracer_tpu import RenderConfig
    from path_tracer_tpu.integrator.resolve import resolve
    from path_tracer_tpu.integrator.wavefront import render

    scene, _ = _instanced_scene(5)
    packed = compile_mod.compile_scene(scene, aspect_ratio=2.0)
    layout = SceneLayout.from_packed(packed)
    assert layout.packet_mode == 'inst'
    config = RenderConfig(width=64, height=32)
    state = render(packed, config, 3, seed=0, layout=layout)
    img = np.asarray(resolve(state['accum'], 64, 32))
    assert img.shape == (32, 64, 3)
    assert np.isfinite(img).all()


def test_inst_incremental_move_keeps_mesh_tables():
    """Moving one instance recompiles the TLAS + instance rows but the
    shared object-space mesh tables stay bitwise identical (the editor
    reaction-time property the world-flatten lacked)."""
    scene, _ = _instanced_scene(6)
    packed = compile_mod.compile_scene(scene)
    tris_before = np.asarray(packed.inst_tris)
    inst = [e for e in scene.walk_entities()
            if e.type == ENTITY_TYPE_MESH_INSTANCE][0]
    inst.transform.position = inst.transform.position + 1.0
    from path_tracer_tpu.scene.model import SCENE_DIRTY_SHAPES
    scene.mark_dirty(SCENE_DIRTY_SHAPES)
    packed2 = compile_mod.compile_scene(scene, prev=packed)
    np.testing.assert_array_equal(tris_before, np.asarray(packed2.inst_tris))
    assert not np.array_equal(np.asarray(packed.inst_rows),
                              np.asarray(packed2.inst_rows))


def test_streaming_matches_resident():
    """With the VMEM budget artificially shrunk, the kernel keeps a
    resident prefix and streams cold rows from HBM per pop -- results
    must be bitwise identical to the fully resident run."""
    import jax

    scene, rng = _instanced_scene(6, seed=21)
    packed = compile_mod.compile_scene(scene)
    layout = SceneLayout.from_packed(packed)
    n = 1024
    o = jnp.asarray(rng.uniform(-6, 6, (3, n)).astype(np.float32))
    d = rng.normal(0, 1, (3, n)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    d = jnp.asarray(d)
    t_in = jnp.full((n,), 1e6, jnp.float32)
    args = (packed.inst_nodes, packed.inst_tris, packed.inst_rows,
            o, d, t_in)

    ref = [np.asarray(x) for x in trace_inst.inst_trace(
        *args, tlas_rows=layout.tlas_rows, interpret=True)]

    orig = trace_inst.VMEM_TABLE_LIMIT_BYTES
    try:
        trace_inst.VMEM_TABLE_LIMIT_BYTES = (
            int(packed.inst_nodes.shape[0])
            + int(packed.inst_tris.shape[0]) // 2
            + int(packed.inst_rows.shape[0]) + 2) * 512
        jax.clear_caches()  # residency is baked into the jitted program
        split = trace_inst.residency_split(packed.inst_nodes.shape,
                                           packed.inst_tris.shape,
                                           packed.inst_rows.shape)
        assert split[1] < int(packed.inst_tris.shape[0])  # really streams
        out = [np.asarray(x) for x in trace_inst.inst_trace(
            *args, tlas_rows=layout.tlas_rows, interpret=True)]
    finally:
        trace_inst.VMEM_TABLE_LIMIT_BYTES = orig
        jax.clear_caches()
    for a, b in zip(ref, out):
        np.testing.assert_array_equal(a, b)


def test_octant_perm_lanes():
    """write_octant_perms stamps valid far-first push permutations:
    each perm lane is a packed permutation of 0..7, and walking it in
    push order visits children in DESCENDING centroid distance along
    the octant's sign vector (LIFO pops then run front-to-back)."""
    from path_tracer_tpu.scene import bvh8

    scene, rng = _instanced_scene(3)
    packed = compile_mod.compile_scene(scene)
    nodes = np.asarray(packed.inst_nodes)
    metas = nodes[:, bvh8.META_LANE:bvh8.META_LANE + 8]
    w = 8
    cx = 0.5 * (nodes[:, 0:8] + nodes[:, 24:32])
    cy = 0.5 * (nodes[:, 8:16] + nodes[:, 32:40])
    cz = 0.5 * (nodes[:, 16:24] + nodes[:, 40:48])
    interior = (metas != 0).any(axis=1)
    assert interior.any()
    # Bucket-padded rows (compile.py _bucket_rows / TLAS padding) are
    # all-zero and never visited; perm lanes are only meaningful on
    # real rows.
    real = (nodes != 0).any(axis=1)
    for o in range(8):
        packed_perm = nodes[:, bvh8.PERM_LANE + o].astype(np.int64)
        order = np.stack([(packed_perm >> (3 * i)) & 7 for i in range(w)],
                         axis=1)
        # Valid permutation of 0..7 on every real row.
        assert (np.sort(order[real], axis=1) == np.arange(w)).all()
        s = np.array([-1.0 if (o & 4) else 1.0,
                      -1.0 if (o & 2) else 1.0,
                      -1.0 if (o & 1) else 1.0])
        d = s[0] * cx + s[1] * cy + s[2] * cz
        for widx in np.nonzero(interior)[0][:16]:
            seq = d[widx, order[widx]]
            # Far-first: non-increasing distance along the push walk.
            assert (np.diff(seq) <= 1e-5).all(), (widx, o, seq)


def test_inst_trace_stats_mode():
    """stats=True returns [interior, leaf, iters, inst_enters, culled]
    counters and does not perturb the hit results."""
    scene, rng = _instanced_scene(4)
    packed = compile_mod.compile_scene(scene)
    layout = SceneLayout.from_packed(packed)
    n = 1024
    o = jnp.asarray(rng.uniform(-5, 5, (3, n)).astype(np.float32))
    d = rng.normal(0, 1, (3, n)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    d = jnp.asarray(d)
    t_in = jnp.full((n,), 1e7, jnp.float32)

    base = trace_inst.inst_trace(
        packed.inst_nodes, packed.inst_tris, packed.inst_rows, o, d, t_in,
        tlas_rows=layout.tlas_rows, interpret=True)
    *withs, st = trace_inst.inst_trace(
        packed.inst_nodes, packed.inst_tris, packed.inst_rows, o, d, t_in,
        tlas_rows=layout.tlas_rows, interpret=True, stats=True)
    st = np.asarray(st)
    assert st.shape == (5,)
    interior, leafp, iters, inst_enters, culled = (int(x) for x in st)
    assert leafp > 0 and iters >= interior + leafp
    assert inst_enters >= 1
    assert culled == 0  # POP_CULL defaults off
    for a, b in zip(base, withs):
        assert (np.asarray(a) == np.asarray(b)).all()

    # stats='lanes' broadcasts each packet's counters to its lanes
    # (the preview complexity heatmaps ride this): per-lane rows are
    # constant within a packet group and their per-packet sum matches
    # the summed counters.
    *withs_l, stl = trace_inst.inst_trace(
        packed.inst_nodes, packed.inst_tris, packed.inst_rows, o, d, t_in,
        tlas_rows=layout.tlas_rows, interpret=True, stats='lanes')
    stl = np.asarray(stl)
    assert stl.shape == (n, 5)
    group = trace_inst.INTERLEAVE * trace_inst.PACKET_ROWS * 128
    for g in range(0, n, group):
        blk = stl[g:g + group]
        assert (blk == blk[0]).all()
    # Per-packet counters (one row per group) sum to the stats=True
    # totals; n=1024 pads into a single packet group here, so the
    # per-lane rows ARE the summed counters.
    per_packet = stl[::group]
    assert (per_packet.sum(axis=0) == st).all()
    for a, b in zip(base, withs_l):
        assert (np.asarray(a) == np.asarray(b)).all()


def test_pop_cull_equality():
    """Pop-time reach culling (a measured on-chip negative kept gated,
    tools/exp_popcull.py) must stay an exact no-op on results: culled
    pops can only be ones no ray could improve on."""
    scene, rng = _instanced_scene(5)
    packed = compile_mod.compile_scene(scene)
    layout = SceneLayout.from_packed(packed)
    n = 2048
    o = jnp.asarray(rng.uniform(-5, 5, (3, n)).astype(np.float32))
    d = rng.normal(0, 1, (3, n)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    d = jnp.asarray(d)
    t_in = jnp.full((n,), 1e7, jnp.float32)

    base = trace_inst.inst_trace(
        packed.inst_nodes, packed.inst_tris, packed.inst_rows, o, d, t_in,
        tlas_rows=layout.tlas_rows, interpret=True, pop_cull=False)
    cull = trace_inst.inst_trace(
        packed.inst_nodes, packed.inst_tris, packed.inst_rows, o, d, t_in,
        tlas_rows=layout.tlas_rows, interpret=True, pop_cull=True)
    for a, b in zip(base, cull):
        assert (np.asarray(a) == np.asarray(b)).all()


def test_quant_nodes_equality():
    """bf16 pair-packed node bounds (a gated A/B, tools/
    exp_quantnodes.py) must leave hits EXACT: conservative rounding
    only loosens culls, leaf tests stay f32."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / 'tools'))
    from exp_quantnodes import pack_quant_nodes

    scene, rng = _instanced_scene(5)
    packed = compile_mod.compile_scene(scene)
    layout = SceneLayout.from_packed(packed)
    n = 2048
    o = jnp.asarray(rng.uniform(-5, 5, (3, n)).astype(np.float32))
    d = rng.normal(0, 1, (3, n)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    d = jnp.asarray(d)
    t_in = jnp.full((n,), 1e7, jnp.float32)

    base = trace_inst.inst_trace(
        packed.inst_nodes, packed.inst_tris, packed.inst_rows, o, d, t_in,
        tlas_rows=layout.tlas_rows, interpret=True, quant=False)
    quant = trace_inst.inst_trace(
        pack_quant_nodes(packed.inst_nodes), packed.inst_tris,
        packed.inst_rows, o, d, t_in,
        tlas_rows=layout.tlas_rows, interpret=True, quant=True)
    assert (np.asarray(base[1]) >= 0).any()
    for a, b in zip(base, quant):
        assert (np.asarray(a) == np.asarray(b)).all()


def test_streamed_leaf_row_ordering():
    """Scenes that will stream leaf rows get them reordered by
    camera-projected importance (compile.py _order_streamed_leaf_rows)
    so the resident prefix holds the hottest geometry. The reorder must
    be traversal-invariant: same winners, same hit t, face slots
    remapped consistently through inst_face_map."""
    import jax

    scene, rng = _instanced_scene(6, seed=33)
    packed_a = compile_mod.compile_scene(scene)
    layout = SceneLayout.from_packed(packed_a)

    scene_b, _ = _instanced_scene(6, seed=33)
    orig = trace_inst.VMEM_TABLE_LIMIT_BYTES
    try:
        trace_inst.VMEM_TABLE_LIMIT_BYTES = 8 * 512
        packed_b = compile_mod.compile_scene(scene_b)
    finally:
        trace_inst.VMEM_TABLE_LIMIT_BYTES = orig
        jax.clear_caches()

    tris_a = np.asarray(packed_a.inst_tris)
    tris_b = np.asarray(packed_b.inst_tris)
    assert tris_a.shape == tris_b.shape
    assert not np.array_equal(tris_a, tris_b)          # really reordered
    # Same geometry rows as a multiset (rows move, none change).
    ka = np.sort(tris_a.sum(axis=1))
    kb = np.sort(tris_b.sum(axis=1))
    np.testing.assert_allclose(ka, kb, rtol=1e-6)
    fa = np.sort(np.asarray(packed_a.inst_face_map))
    fb = np.sort(np.asarray(packed_b.inst_face_map))
    np.testing.assert_array_equal(fa, fb)

    n = 1024
    o = jnp.asarray(rng.uniform(-6, 6, (3, n)).astype(np.float32))
    d = rng.normal(0, 1, (3, n)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    d = jnp.asarray(d)
    t_in = jnp.full((n,), 1e6, jnp.float32)

    ta, face_a, *_ = (np.asarray(x) for x in trace_inst.inst_trace(
        packed_a.inst_nodes, packed_a.inst_tris, packed_a.inst_rows,
        o, d, t_in, tlas_rows=layout.tlas_rows, interpret=True))
    tb, face_b, *_ = (np.asarray(x) for x in trace_inst.inst_trace(
        packed_b.inst_nodes, packed_b.inst_tris, packed_b.inst_rows,
        o, d, t_in, tlas_rows=layout.tlas_rows, interpret=True))
    # Hit t identical up to leaf-visit order (exact-tie winners may
    # differ on shared edges, like the portable-equality test).
    same_t = ta == tb
    assert same_t.mean() > 0.995
    # Winning faces map to the same source face through each table's
    # own face map.
    ma = np.asarray(packed_a.inst_face_map)[np.where(face_a >= 0, face_a, 0)]
    mb = np.asarray(packed_b.inst_face_map)[np.where(face_b >= 0, face_b, 0)]
    hit = (face_a >= 0) & (face_b >= 0) & same_t
    assert (ma[hit] == mb[hit]).mean() > 0.995
