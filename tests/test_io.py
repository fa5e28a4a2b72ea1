"""Serializer round-trip, OBJ import, HDR/PNG IO, preview/picking."""

import os

import numpy as np
import jax.numpy as jnp

from path_tracer_tpu.core.constants import (
    MATERIAL_TYPE_BASIC_METAL,
    MATERIAL_TYPE_BASIC_TRANSLUCENT,
    TEXTURE_TYPE_RADIANCE,
)
from path_tracer_tpu.scene.compile import compile_scene
from path_tracer_tpu.scene.model import (
    ENTITY_TYPE_CAMERA,
    ENTITY_TYPE_MESH_INSTANCE,
    ENTITY_TYPE_SPHERE,
    Scene,
    Transform,
)
from path_tracer_tpu.scene.objload import load_model_as_prefab
from path_tracer_tpu.scene.procedural import (
    gradient_sky_texture,
    make_cornell_scene,
    torus,
)
from path_tracer_tpu.scene.serializer import load_scene, save_scene
from path_tracer_tpu.utils.image import load_hdr, save_hdr, save_png
from path_tracer_tpu.viewer import preview
from path_tracer_tpu.ops.intersect import SceneLayout


def test_scene_json_roundtrip(tmp_path):
    scene = make_cornell_scene()
    # Add every material type, a texture, and a mesh for coverage.
    p, n, u, f = torus(8, 4)
    mesh = scene.create_mesh(name='ring', positions=p, normals=n, uvs=u, faces=f)
    metal = scene.create_material(MATERIAL_TYPE_BASIC_METAL, name='chrome',
                                  base_color=np.asarray([0.9, 0.9, 0.95]),
                                  roughness=0.12)
    glass = scene.create_material(MATERIAL_TYPE_BASIC_TRANSLUCENT, name='glass',
                                  ior=1.52, abbe_number=41.0)
    scene.create_entity(ENTITY_TYPE_MESH_INSTANCE, mesh=mesh, material=metal,
                        transform=Transform(position=[0, 0, 1.5]))
    sky = scene.create_texture(name='sky', type=TEXTURE_TYPE_RADIANCE,
                               pixels=gradient_sky_texture(32, 16))
    scene.root.skybox_texture = sky
    scene.root.skybox_brightness = 2.5

    path = os.path.join(tmp_path, 'scene.json')
    save_scene(path, scene)
    loaded = load_scene(path)

    assert len(loaded.materials) == len(scene.materials)
    assert len(loaded.meshes) == 1
    assert len(loaded.textures) == 1
    assert loaded.root.skybox_brightness == 2.5
    assert loaded.root.skybox_texture is loaded.textures[0]
    np.testing.assert_allclose(loaded.textures[0].pixels, sky.pixels, rtol=1e-6)

    chrome = [m for m in loaded.materials if m.name == 'chrome'][0]
    assert chrome.type == MATERIAL_TYPE_BASIC_METAL
    np.testing.assert_allclose(chrome.base_color, [0.9, 0.9, 0.95])
    assert abs(chrome.roughness - 0.12) < 1e-6

    ring = loaded.meshes[0]
    assert ring.positions.shape == (len(p), 3)
    assert ring.bvh is not None  # prebuilt nodes reloaded

    cams = [e for e in loaded.walk_entities() if e.type == ENTITY_TYPE_CAMERA]
    assert len(cams) == 1
    assert abs(cams[0].pinhole.field_of_view_in_degrees - 60.0) < 1e-5

    # The loaded scene must compile and trace identically.
    packed_a = compile_scene(scene)
    packed_b = compile_scene(loaded)
    np.testing.assert_allclose(np.asarray(packed_a.scene_bounds),
                               np.asarray(packed_b.scene_bounds), atol=1e-5)


def test_reference_schema_fixture():
    """Load a checked-in scene file written in the reference's exact JSON
    schema (hand-transcribed per serializer.cpp:330-393: int-tagged
    entity types, nested Pinhole/ThinLens blocks, CamelCase material
    fields, index-based asset references) and render it.

    This makes the format-compatibility claim falsifiable: the file was
    never produced by our own save_scene.
    """
    fixture = os.path.join(os.path.dirname(__file__), 'fixtures',
                           'reference_scene', 'scene.json')
    scene = load_scene(fixture)

    assert [m.type for m in scene.materials] == [0, 1, 2]
    names = [e.name for e in scene.root.children]
    assert names == ['Plane', 'Metal Sphere', 'Glass Cube', 'Camera']
    cam = scene.root.children[3]
    assert cam.type == ENTITY_TYPE_CAMERA
    assert cam.pinhole.field_of_view_in_degrees == 90.0
    assert cam.thin_lens.focal_length_in_mm == 20.0
    glass = scene.materials[2]
    assert glass.ior == 1.5 and glass.abbe_number == 35.0

    # The fixture must compile and produce a finite, non-empty render.
    from path_tracer_tpu.integrator.resolve import resolve
    from path_tracer_tpu.integrator.wavefront import RenderConfig, render

    packed = compile_scene(scene)
    config = RenderConfig(width=64, height=36, sort_rays=False)
    state = render(packed, config, spp_rounds=8, seed=0)
    image = np.asarray(resolve(state['accum'], 64, 36, lane=state['lane']))
    assert np.isfinite(image).all()
    assert image.max() > 0.0


def test_obj_import(tmp_path):
    obj = tmp_path / 'tri.obj'
    obj.write_text('''mtllib tri.mtl
o quad
usemtl red
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
f 1/1 2/2 3/3 4/4
''')
    (tmp_path / 'tri.mtl').write_text('newmtl red\nKd 0.8 0.1 0.1\n')

    scene = Scene()
    prefab = load_model_as_prefab(scene, str(obj))
    assert len(scene.meshes) == 1
    mesh = scene.meshes[0]
    assert len(mesh.faces) == 2  # quad fan-triangulated
    assert len(mesh.positions) == 4  # deduped
    # Generated normals face +Z.
    np.testing.assert_allclose(mesh.normals, [[0, 0, 1]] * 4, atol=1e-5)
    assert len(scene.materials) == 1
    np.testing.assert_allclose(scene.materials[0].base_color, [0.8, 0.1, 0.1])
    assert prefab.entity.children[0].material is scene.materials[0]

    instance = scene.instantiate_prefab(prefab)
    assert instance.children[0].mesh is mesh or instance.children[0].mesh.name == mesh.name


def test_hdr_roundtrip(tmp_path):
    img = gradient_sky_texture(64, 32)[:, :, :3]
    path = os.path.join(tmp_path, 'sky.hdr')
    save_hdr(path, img)
    back = load_hdr(path)
    assert back.shape == (32, 64, 4)
    # RGBE has ~1% mantissa precision.
    np.testing.assert_allclose(back[..., :3], img, rtol=2e-2, atol=1e-4)


def test_png_writer(tmp_path):
    img = np.random.RandomState(0).rand(16, 24, 3).astype(np.float32)
    path = os.path.join(tmp_path, 'out.png')
    save_png(path, img)
    from PIL import Image
    back = np.asarray(Image.open(path).convert('RGB'), np.float32) / 255.0
    np.testing.assert_allclose(back, img, atol=1 / 255.0 + 1e-3)


def test_preview_modes_and_picking():
    scene = make_cornell_scene()
    packed = compile_scene(scene)
    layout = SceneLayout.from_packed(packed)
    cam = [e for e, w in scene.walk_entities_with_transform()
           if e.type == ENTITY_TYPE_CAMERA][0]
    from path_tracer_tpu.scene.model import make_transform_matrix
    world = jnp.asarray(make_transform_matrix(
        cam.transform.position, cam.transform.rotation))

    for mode in range(5):
        img = np.asarray(preview.render_preview(
            packed, layout, 64, 32, world, mode=mode))
        assert img.shape == (32, 64, 3)
        assert np.isfinite(img).all()
        assert img.max() > 0.01, mode

    # Picking: center of the image should hit some shape; the sky above
    # the open box at the top-left corner may miss.
    shape = preview.pick(packed, layout, 64, 32, world, 32, 16)
    assert shape >= 0
    # Selected-shape tint runs.
    img = np.asarray(preview.render_preview(
        packed, layout, 32, 16, world, selected_shape=shape))
    assert np.isfinite(img).all()


def test_default_scene_and_complexity_heatmap():
    """The reference's startup scene (checker plane, scene.cpp:912-943)
    renders, and the traversal-complexity heatmap modes produce signal."""
    import jax.numpy as jnp
    from path_tracer_tpu.scene.procedural import make_default_scene, make_viking_hall_scene
    from path_tracer_tpu import render_scene as rs

    scene = make_default_scene()
    img = np.asarray(rs(scene, width=32, height=16, spp_rounds=20, seed=1))
    assert np.isfinite(img).all()
    # The checker texture must produce spatial variation on the floor.
    floor = img[12:, :, :].mean(axis=-1)
    assert floor.std() > 0.01

    # Heatmap over a mesh scene: hits have nonzero complexity.
    mscene = make_viking_hall_scene()
    packed = compile_scene(mscene)
    layout = SceneLayout.from_packed(packed)
    from path_tracer_tpu.scene.model import make_transform_matrix
    cam = [e for e, w in mscene.walk_entities_with_transform()
           if e.type == ENTITY_TYPE_CAMERA][0]
    world = jnp.asarray(make_transform_matrix(
        cam.transform.position, cam.transform.rotation))
    heat = np.asarray(preview.render_preview(
        packed, layout, 32, 16, world,
        mode=preview.PREVIEW_RENDER_MODE_MESH_COMPLEXITY))
    assert heat[..., 1].max() > 0.02  # green channel carries the cost
    assert heat[..., 0].max() == 0.0


def test_sample_texture_quad_path_matches_four_gathers():
    """The quad-atlas bilinear/nearest path must reproduce the 4-gather
    path bit-for-bit, including the clamped edge texels."""
    import jax.numpy as jnp
    from path_tracer_tpu import compile_scene
    from path_tracer_tpu.models.common import sample_texture
    from path_tracer_tpu.scene.model import Scene
    from path_tracer_tpu.core.constants import (
        TEXTURE_TYPE_REFLECTANCE_WITH_ALPHA)

    rng = np.random.default_rng(0)
    scene = Scene()
    for k, nearest in enumerate((False, True)):
        pixels = rng.uniform(0, 1, (13, 9, 3)).astype(np.float32)
        scene.create_texture(name=f't{k}', pixels=pixels,
                             type=TEXTURE_TYPE_REFLECTANCE_WITH_ALPHA,
                             enable_nearest_filtering=nearest)
    packed = compile_scene(scene, aspect_ratio=1.0)
    assert packed.atlas_quad.shape[0] > 1

    n = 4096
    idx = jnp.asarray(rng.integers(0, 2, n).astype(np.int32))
    # Include exact edges, corners and out-of-range wraps.
    uv = rng.uniform(-1.2, 2.2, (2, n)).astype(np.float32)
    uv[:, :8] = np.array([[0, 1, 0, 1, 0.5, 1e-4, 0.9999, 0.3],
                          [0, 0, 1, 1, 0.5, 1e-4, 0.9999, 0.7]])
    size = int(packed.atlas_size)
    for filters in ((True, True), (True, False), (False, True)):
        a = sample_texture(packed, idx, jnp.asarray(uv), size, filters,
                           use_quad=False)
        b = sample_texture(packed, idx, jnp.asarray(uv), size, filters,
                           use_quad=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
