"""Editor program stability: small edits must reuse compiled programs.

The jit cache key covers every packed array SHAPE plus the static
SceneLayout, so compile.py bucket-pads the variable table dimensions
(shapes, analytic groups, materials, cameras) and intersect_analytic
keeps shape indices TRACED. Before this, adding one entity retraced the
fused render program through the compile relay: 23-95 s per edit on
hardware (tools/measure_editor.py).
"""

import numpy as np

from path_tracer_tpu import RenderConfig, SceneLayout, compile_scene
from path_tracer_tpu.core.constants import (
    MATERIAL_TYPE_BASIC_DIFFUSE, MATERIAL_TYPE_BASIC_METAL)
from path_tracer_tpu.integrator import wavefront
from path_tracer_tpu.ops.intersect import trace
from path_tracer_tpu.scene.model import (
    ENTITY_TYPE_CAMERA, ENTITY_TYPE_SPHERE, SCENE_DIRTY_MATERIALS,
    SCENE_DIRTY_SHAPES, Scene, Transform)

import jax.numpy as jnp


def _scene():
    scene = Scene()
    mat = scene.create_material(MATERIAL_TYPE_BASIC_DIFFUSE, name='m',
                                base_color=np.asarray([0.5, 0.5, 0.5]))
    scene.create_entity(ENTITY_TYPE_SPHERE, material=mat,
                        transform=Transform(position=[0.0, 3.0, 0.0]))
    scene.create_entity(ENTITY_TYPE_CAMERA,
                        transform=Transform(position=[0.0, 0.0, 0.0]))
    return scene, mat


def _cache_sizes():
    return (wavefront._render_jit._cache_size(),
            wavefront._reset_jit._cache_size())


def test_entity_add_within_bucket_reuses_programs():
    # Analytic groups are bucket-padded only under generic programs
    # (padded slots cost real per-lane work; specialized batch
    # programs keep exact group sizes -- see compile.py).
    scene, mat = _scene()
    scene.compile_generic = True
    packed = compile_scene(scene)
    layout = packed.host_layout
    config = RenderConfig(width=32, height=16)
    wavefront.render(packed, config, 2, seed=0, layout=layout)
    before = _cache_sizes()

    # Second sphere: same analytic bucket (4), same padded table dims.
    scene.create_entity(ENTITY_TYPE_SPHERE, material=mat,
                        transform=Transform(position=[1.2, 3.0, 0.0]))
    scene.mark_dirty(SCENE_DIRTY_SHAPES)
    packed2 = compile_scene(scene, prev=packed)
    layout2 = packed2.host_layout
    assert layout2 == layout

    wavefront.render(packed2, config, 2, seed=1, layout=layout2)
    assert _cache_sizes() == before, 'entity add recompiled a program'

    # The new sphere is really there: rays aimed at it hit shape 1.
    n = 64
    o = jnp.zeros((3, n), jnp.float32)
    d = jnp.broadcast_to(
        jnp.asarray([[1.2], [3.0], [0.0]], jnp.float32)
        / np.sqrt(1.2 ** 2 + 3.0 ** 2), (3, n))
    hit = trace(packed2, layout2, o, d, use_packet=False)
    assert int((np.asarray(hit['shape']) == 1).sum()) == n


def test_material_add_within_bucket_reuses_programs():
    scene, _ = _scene()
    packed = compile_scene(scene)
    layout = packed.host_layout
    config = RenderConfig(width=32, height=16)
    wavefront.render(packed, config, 2, seed=0, layout=layout)
    before = _cache_sizes()

    # 1 fallback + 1 real material -> bucket 4: one more diffuse
    # material keeps every column shape (a new TYPE would legitimately
    # change the layout's static material set).
    scene.create_material(MATERIAL_TYPE_BASIC_DIFFUSE, name='m2',
                          base_color=np.asarray([0.8, 0.2, 0.2]))
    scene.mark_dirty(SCENE_DIRTY_MATERIALS)
    packed2 = compile_scene(scene, prev=packed)
    layout2 = packed2.host_layout
    assert layout2 == layout
    wavefront.render(packed2, config, 2, seed=1, layout=layout2)
    assert _cache_sizes() == before, 'material add recompiled a program'


def test_instance_add_within_bucket_reuses_programs():
    """Mesh-instance adds reuse programs too: the portable path reads
    the traced instance table, the v6 tables bucket their TLAS/node/
    geometry rows, and instance_slots is the only static."""
    from path_tracer_tpu.scene.model import ENTITY_TYPE_MESH_INSTANCE
    from path_tracer_tpu.scene.procedural import heightfield

    scene = Scene()
    pos, nrm, uv, faces = heightfield(8, size=4.0, amplitude=0.5)
    mesh = scene.create_mesh(name='hf', positions=pos, normals=nrm,
                             uvs=uv, faces=faces)
    mat = scene.create_material(MATERIAL_TYPE_BASIC_DIFFUSE, name='g',
                                base_color=np.asarray([0.5, 0.5, 0.5]))
    for k in range(2):
        scene.create_entity(ENTITY_TYPE_MESH_INSTANCE, mesh=mesh,
                            material=mat,
                            transform=Transform(position=[3.0 * k, 0, 0]))
    scene.create_entity(ENTITY_TYPE_CAMERA,
                        transform=Transform(position=[0.0, -6.0, 3.0]))
    packed = compile_scene(scene)
    layout = packed.host_layout
    assert layout.instance_slots == 4  # 2 instances bucket to 4
    config = RenderConfig(width=32, height=16)
    wavefront.render(packed, config, 2, seed=0, layout=layout)
    before = _cache_sizes()

    # Third instance of the same mesh: same bucket, same padded tables
    # (TLAS bucket 8, mesh rows unchanged, inst_rows bucket 4).
    scene.create_entity(ENTITY_TYPE_MESH_INSTANCE, mesh=mesh, material=mat,
                        transform=Transform(position=[-3.0, 0, 0]))
    scene.mark_dirty(SCENE_DIRTY_SHAPES)
    packed2 = compile_scene(scene, prev=packed)
    layout2 = packed2.host_layout
    assert layout2 == layout
    for a, b in ((packed.inst_nodes, packed2.inst_nodes),
                 (packed.inst_tris, packed2.inst_tris),
                 (packed.portable_inst_root, packed2.portable_inst_root)):
        assert a.shape == b.shape
    wavefront.render(packed2, config, 2, seed=1, layout=layout2)
    assert _cache_sizes() == before, 'instance add recompiled a program'

    # The third instance really traces: rays straight down over it hit.
    n = 32
    o = jnp.stack([jnp.full(n, -3.0), jnp.zeros(n), jnp.full(n, 5.0)])
    d = jnp.broadcast_to(jnp.asarray([[0.0], [0.0], [-1.0]]), (3, n))
    hit = trace(packed2, layout2, o, d, use_packet=False)
    assert int((np.asarray(hit['shape']) >= 0).sum()) == n


def test_generic_session_never_retraces_on_new_type():
    """Interactive Sessions compile GENERIC programs (all analytic
    types + all material models + conservative scatter flags), so even
    the first entity of a brand-new shape type reuses every program --
    the editor never stalls on a relay recompile."""
    from path_tracer_tpu.app import Session
    from path_tracer_tpu.scene.model import ENTITY_TYPE_MESH_INSTANCE
    from path_tracer_tpu.scene.procedural import heightfield

    scene = Scene()
    pos, nrm, uv, faces = heightfield(6, size=4.0, amplitude=0.5)
    mesh = scene.create_mesh(name='hf', positions=pos, normals=nrm,
                             uvs=uv, faces=faces)
    mat = scene.create_material(MATERIAL_TYPE_BASIC_DIFFUSE, name='g',
                                base_color=np.asarray([0.5, 0.5, 0.5]))
    scene.create_entity(ENTITY_TYPE_MESH_INSTANCE, mesh=mesh, material=mat)
    scene.create_entity(ENTITY_TYPE_CAMERA,
                        transform=Transform(position=[0.0, -6.0, 3.0]))

    session = Session(scene, width=48, height=24)
    assert session.layout.analytic_buckets == ((1, 4), (2, 4), (3, 4))
    assert session.layout.material_types == (0, 1, 2, 3)
    np.asarray(session.frame())
    before = _cache_sizes() + (wavefront._render_sorted_jit._cache_size(),)

    # First sphere (and a new MATERIAL TYPE) of the session: no
    # program structure change under generic mode.
    metal = scene.create_material(MATERIAL_TYPE_BASIC_METAL, name='shine',
                                  base_color=np.asarray([0.9, 0.8, 0.6]))
    scene.create_entity(ENTITY_TYPE_SPHERE, material=metal,
                        transform=Transform(position=[0.0, 0.0, 2.0]))
    scene.mark_dirty(SCENE_DIRTY_SHAPES | SCENE_DIRTY_MATERIALS)
    img = np.asarray(session.frame())
    after = _cache_sizes() + (wavefront._render_sorted_jit._cache_size(),)
    assert after == before, 'generic session recompiled a program'
    assert np.isfinite(img).all()

    # Assigning a texture to a material (no atlas repack) is also
    # structure-free: generic programs compile every attribute tap.
    from path_tracer_tpu.core.constants import (
        TEXTURE_TYPE_REFLECTANCE_WITH_ALPHA)
    checker = np.indices((8, 8)).sum(0) % 2
    pixels = np.stack([checker, 1 - checker, checker, np.ones((8, 8))],
                      axis=-1).astype(np.float32)
    tex = scene.create_texture(name='check',
                               type=TEXTURE_TYPE_REFLECTANCE_WITH_ALPHA,
                               pixels=pixels)
    session.frame()  # atlas shape change MAY retrace; not asserted
    mid = _cache_sizes() + (wavefront._render_sorted_jit._cache_size(),)
    mat.base_texture = tex
    scene.mark_dirty(SCENE_DIRTY_MATERIALS)
    img = np.asarray(session.frame())
    final = _cache_sizes() + (wavefront._render_sorted_jit._cache_size(),)
    assert final == mid, 'texture assignment recompiled a program'
    assert np.isfinite(img).all()


def test_bucket_boundary_changes_layout():
    """Crossing a bucket boundary legitimately retraces: 5 spheres pad
    to 8 under generic programs. Guards that the bucketing is actually
    bounded (no silent always-equal layouts)."""
    scene, mat = _scene()
    scene.compile_generic = True
    packed = compile_scene(scene)
    for k in range(4):
        scene.create_entity(ENTITY_TYPE_SPHERE, material=mat,
                            transform=Transform(position=[k, 5.0, 0.0]))
    scene.mark_dirty(SCENE_DIRTY_SHAPES)
    packed2 = compile_scene(scene, prev=packed)
    assert packed2.host_layout != packed.host_layout
    assert dict(packed2.host_layout.analytic_buckets)[2] == 8

    # Specialized (batch) programs keep EXACT analytic group sizes --
    # no phantom per-lane intersection work on the bench configs.
    scene.compile_generic = False
    scene.mark_dirty(SCENE_DIRTY_SHAPES)
    packed3 = compile_scene(scene, prev=packed2)
    assert dict(packed3.host_layout.analytic_buckets)[2] == 5
