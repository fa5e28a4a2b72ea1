"""Session (editor loop), native builder, incremental recompile tests."""

import numpy as np

from path_tracer_tpu.app import Session
from path_tracer_tpu.scene.procedural import make_cornell_scene
from path_tracer_tpu.scene.bvh import Bvh, build_bvh, validate_bvh
from path_tracer_tpu.scene.native import available, build_bvh_native
from path_tracer_tpu.scene.procedural import torus


def test_session_progressive_and_restart():
    session = Session(make_cornell_scene(), width=32, height=16)
    img1 = np.asarray(session.frame())
    assert img1.shape == (16, 32, 3)
    spp1 = session.samples_per_pixel()
    np.asarray(session.frame())
    np.asarray(session.frame())
    spp2 = session.samples_per_pixel()
    assert spp2 > spp1  # progressive accumulation

    # Camera move -> dirty -> accumulation restarts.
    session.move_camera(delta=(0.0, 0.0, -0.5))
    np.asarray(session.frame())
    spp3 = session.samples_per_pixel()
    assert spp3 < spp2

    # Editor services.
    pimg = np.asarray(session.preview())
    assert pimg.shape == (16, 32, 3) and np.isfinite(pimg).all()
    shape = session.pick(16, 8)
    assert shape >= -1


def test_incremental_recompile_matches_full():
    from path_tracer_tpu.scene.compile import compile_scene
    from path_tracer_tpu.scene.model import SCENE_DIRTY_MATERIALS

    scene = make_cornell_scene()
    packed1 = compile_scene(scene)
    # Edit a material color; only the material section is dirty.
    scene.materials[0].base_color = np.asarray([0.2, 0.2, 0.9], np.float32)
    scene.mark_dirty(SCENE_DIRTY_MATERIALS)
    packed2 = compile_scene(scene, prev=packed1)

    scene2 = make_cornell_scene()
    scene2.materials[0].base_color = np.asarray([0.2, 0.2, 0.9], np.float32)
    packed3 = compile_scene(scene2)

    np.testing.assert_allclose(np.asarray(packed2.materials.base_spectrum),
                               np.asarray(packed3.materials.base_spectrum),
                               atol=1e-6)
    # Untouched sections are reused (same buffers).
    assert packed2.face_positions is packed1.face_positions


def test_native_builder_matches_python_semantics():
    if not available():
        import pytest
        pytest.skip('no native toolchain')
    p, n, u, f = torus(16, 8)
    tris = p[f]
    nat = Bvh(*build_bvh_native(tris))
    py = build_bvh(tris)
    assert validate_bvh(nat, tris) == []
    assert validate_bvh(py, tris) == []
    # Same leaf coverage cap and similar node counts.
    assert ((nat.b - nat.a)[nat.b > 0] <= 4).all()
    assert abs(len(nat.a) - len(py.a)) < 0.2 * len(py.a)
    # Root bounds identical.
    np.testing.assert_allclose(nat.node_min[0], py.node_min[0], atol=1e-6)
    np.testing.assert_allclose(nat.node_max[0], py.node_max[0], atol=1e-6)


def test_empty_mesh_instance_packs_no_shape():
    """A mesh instance whose mesh has no faces (fresh asset, empty
    import) must compile to a scene without that shape slot instead of
    crashing the pack/wide-BVH build, and rays must still hit the
    remaining geometry."""
    import jax.numpy as jnp
    from path_tracer_tpu import compile_scene
    from path_tracer_tpu.ops.intersect import SceneLayout, trace
    from path_tracer_tpu.core.constants import (SHAPE_INDEX_NONE,
                                                SHAPE_TYPE_SPHERE)
    from path_tracer_tpu.scene.model import (
        ENTITY_TYPE_CAMERA, ENTITY_TYPE_MESH_INSTANCE, ENTITY_TYPE_SPHERE,
        Scene)

    scene = Scene()
    scene.create_entity(ENTITY_TYPE_CAMERA)
    empty = scene.create_mesh(name='empty',
                              faces=np.zeros(0, np.int32))  # shape (0,)
    assert empty.faces.shape == (0, 3)                      # normalized
    scene.create_entity(ENTITY_TYPE_MESH_INSTANCE, mesh=empty,
                        material=scene.create_material(1))
    scene.create_entity(ENTITY_TYPE_SPHERE,
                        material=scene.create_material(1))

    packed = compile_scene(scene)
    layout = SceneLayout.from_packed(packed)
    assert layout.instance_slots == 0

    n = 128
    o = jnp.zeros((3, n), jnp.float32)
    o = o.at[1].set(-4.0)
    d = jnp.zeros((3, n), jnp.float32).at[1].set(1.0)
    h = trace(packed, layout, o, d, use_packet=False)
    shp = np.asarray(h['shape'])
    assert (shp != SHAPE_INDEX_NONE).all()                  # sphere hit
