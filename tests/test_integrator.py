"""End-to-end integrator tests: furnace, Cornell, determinism, MIS."""

import numpy as np
import pytest
import jax.numpy as jnp

from path_tracer_tpu import (
    RenderConfig,
    SceneLayout,
    Scene,
    Transform,
    compile_scene,
    render,
    render_scene,
    resolve,
)
from path_tracer_tpu.core.constants import (
    MATERIAL_TYPE_BASIC_DIFFUSE,
    MATERIAL_TYPE_BASIC_METAL,
)
from path_tracer_tpu.scene.model import (
    ENTITY_TYPE_CAMERA,
    ENTITY_TYPE_SPHERE,
)
from path_tracer_tpu.scene.procedural import make_cornell_scene


def _mean_image(scene, rounds=160, w=32, h=16, seed=0, **kwargs):
    img = render_scene(scene, width=w, height=h, spp_rounds=rounds, seed=seed,
                       **kwargs)
    return np.asarray(img)


def _furnace_scene(albedo=1.0, roughness=None, material_type=MATERIAL_TYPE_BASIC_DIFFUSE):
    scene = Scene()
    kwargs = dict(base_color=np.full(3, albedo, np.float32))
    if roughness is not None:
        kwargs['roughness'] = roughness
    mat = scene.create_material(material_type, **kwargs)
    scene.create_entity(ENTITY_TYPE_SPHERE, material=mat,
                        transform=Transform(position=[0, 2.5, 0]))
    cam = scene.create_entity(ENTITY_TYPE_CAMERA,
                              transform=Transform(position=[0, -1.5, 0],
                                                  rotation=[np.pi / 2, 0, 0]))
    cam.pinhole.field_of_view_in_degrees = 40.0
    return scene


@pytest.mark.slow
def test_white_furnace_diffuse():
    """A unit-albedo diffuse sphere in a uniform unit sky must converge to
    the same color as the sky itself (energy conservation of the whole
    estimator: BSDF sampling, spectral cluster, RR, accumulation)."""
    img = _mean_image(_furnace_scene(albedo=1.0), rounds=600, w=24, h=12)
    # Sky pixels: corners. Sphere pixels: center.
    sky = img[0, 0]
    center = img[6, 12]
    assert sky.mean() > 0.15
    assert abs(center.mean() - sky.mean()) / sky.mean() < 0.06, (center, sky)


@pytest.mark.slow
def test_dark_sphere_is_darker():
    img = _mean_image(_furnace_scene(albedo=0.2), rounds=200, w=24, h=12)
    sky = img[0, 0].mean()
    center = img[6, 12].mean()
    assert center < 0.55 * sky


@pytest.mark.slow
def test_cornell_walls_are_tinted():
    img = _mean_image(make_cornell_scene(), rounds=250, w=48, h=24,
                      brightness=2.0)
    left = img[12, 2:8].mean(axis=0)
    right = img[12, 40:46].mean(axis=0)
    assert left[0] > 1.5 * left[1], left    # red wall: R >> G
    assert right[1] > 1.5 * right[0], right  # green wall: G >> R
    assert img.max() > 0.05


def test_determinism_same_seed():
    scene = _furnace_scene(albedo=0.5)
    a = _mean_image(scene, rounds=40, w=16, h=8, seed=7)
    b = _mean_image(scene, rounds=40, w=16, h=8, seed=7)
    np.testing.assert_array_equal(a, b)
    c = _mean_image(scene, rounds=40, w=16, h=8, seed=8)
    assert np.abs(a - c).max() > 0


@pytest.mark.slow
def test_skybox_mis_unbiased():
    """Rendering with vMF skybox light sampling enabled must converge to
    the same image as pure BSDF sampling (one-sample MIS correctness,
    basic_scatter.glsl:66-109)."""
    scene = _furnace_scene(albedo=0.6)
    base = _mean_image(scene, rounds=500, w=16, h=8, seed=3)
    scene2 = _furnace_scene(albedo=0.6)
    scene2.root.skybox_sampling_probability = 0.5
    mis = _mean_image(scene2, rounds=500, w=16, h=8, seed=4)
    # Compare sphere-center region means within MC tolerance.
    a = base[3:5, 7:9].mean()
    b = mis[3:5, 7:9].mean()
    assert abs(a - b) / a < 0.08, (a, b)


@pytest.mark.slow
def test_metal_sphere_reflects_not_absorbs():
    img = _mean_image(
        _furnace_scene(albedo=0.9, roughness=0.1,
                       material_type=MATERIAL_TYPE_BASIC_METAL),
        rounds=300, w=24, h=12)
    sky = img[0, 0].mean()
    center = img[6, 12].mean()
    # A 0.9-reflectance mirror sphere in a furnace should be close to the
    # sky value but slightly darker.
    assert 0.5 * sky < center <= 1.05 * sky


@pytest.mark.slow
def test_opacity_stochastic_transparency():
    """A sphere with opacity 0 must be invisible (rays pass through to
    the sky); opacity 1 blocks. The reference serializes Opacity but its
    shaders never read it -- we wire it as stochastic transparency."""
    from path_tracer_tpu.core.constants import MATERIAL_TYPE_BASIC_DIFFUSE
    from path_tracer_tpu.scene.model import (
        ENTITY_TYPE_CAMERA, ENTITY_TYPE_SPHERE, Scene, Transform)

    def img_for(opacity):
        scene = Scene()
        m = scene.create_material(MATERIAL_TYPE_BASIC_DIFFUSE,
                                  base_color=np.asarray([0.05, 0.05, 0.05]),
                                  opacity=opacity)
        scene.create_entity(ENTITY_TYPE_SPHERE, material=m,
                            transform=Transform(position=[0, 2.5, 0]))
        cam = scene.create_entity(
            ENTITY_TYPE_CAMERA,
            transform=Transform(position=[0, -1.5, 0],
                                rotation=[np.pi / 2, 0, 0]))
        cam.pinhole.field_of_view_in_degrees = 40.0
        return np.asarray(render_scene(scene, width=24, height=12,
                                       spp_rounds=80, seed=1))

    solid = img_for(1.0)
    clear = img_for(0.0)
    half = img_for(0.5)
    sky = clear[0, 0].mean()
    # Fully transparent: the sphere's pixel matches the sky.
    assert abs(clear[6, 12].mean() - sky) < 0.25 * sky
    # Fully opaque dark sphere: much darker than sky.
    assert solid[6, 12].mean() < 0.5 * sky
    # Half opacity sits in between.
    assert solid[6, 12].mean() < half[6, 12].mean() < clear[6, 12].mean()


def test_static_specialization_flags_are_bitwise_noops():
    """The three scatter static-specialization flags (scene_has_medium,
    has_skybox_sampling, has_transmissive) must preserve the RNG draw
    order, so forcing each OFF on a scene where it is legitimately
    False yields a bitwise-identical render to the general path."""
    import dataclasses

    import numpy as np

    from path_tracer_tpu import RenderConfig, SceneLayout, compile_scene
    from path_tracer_tpu.integrator.wavefront import render
    from path_tracer_tpu.scene.procedural import make_cornell_scene

    packed = compile_scene(make_cornell_scene(), aspect_ratio=2.0)
    layout = SceneLayout.from_packed(packed)
    assert not layout.scene_has_medium
    assert not layout.has_skybox_sampling
    assert not layout.has_transmissive
    config = RenderConfig(width=48, height=24)

    def run(lay):
        state = render(packed, config, 6, seed=3, layout=lay)
        return (np.asarray(state['accum']['xyz']),
                np.asarray(state['accum']['count']))

    base = run(dataclasses.replace(layout, scene_has_medium=True,
                                   has_skybox_sampling=True,
                                   has_transmissive=True))
    for flag in ('scene_has_medium', 'has_skybox_sampling',
                 'has_transmissive'):
        specialized = run(dataclasses.replace(
            layout, scene_has_medium=flag != 'scene_has_medium',
            has_skybox_sampling=flag != 'has_skybox_sampling',
            has_transmissive=flag != 'has_transmissive'))
        for a, b in zip(base, specialized):
            assert (a == b).all(), flag
    fully = run(layout)
    for a, b in zip(base, fully):
        assert (a == b).all()
