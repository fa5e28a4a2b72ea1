"""OpenPBR layered model tests: furnace, metalness, emission, coat."""

import numpy as np
import pytest
import jax.numpy as jnp

from path_tracer_tpu import render_scene
from path_tracer_tpu.core.constants import MATERIAL_TYPE_OPENPBR
from path_tracer_tpu.scene.model import (
    ENTITY_TYPE_CAMERA,
    ENTITY_TYPE_SPHERE,
    Scene,
    Transform,
)


def _openpbr_scene(**material_kwargs):
    scene = Scene()
    mat = scene.create_material(MATERIAL_TYPE_OPENPBR, **material_kwargs)
    scene.create_entity(ENTITY_TYPE_SPHERE, material=mat,
                        transform=Transform(position=[0, 2.5, 0]))
    cam = scene.create_entity(ENTITY_TYPE_CAMERA,
                              transform=Transform(position=[0, -1.5, 0],
                                                  rotation=[np.pi / 2, 0, 0]))
    cam.pinhole.field_of_view_in_degrees = 40.0
    return scene


def _render(scene, rounds=300, w=24, h=12, seed=0):
    return np.asarray(render_scene(scene, width=w, height=h,
                                   spp_rounds=rounds, seed=seed))


@pytest.mark.slow
def test_openpbr_white_furnace():
    """Unit-albedo diffuse-only OpenPBR sphere in a unit sky: near sky."""
    img = _render(_openpbr_scene(base_color=np.ones(3), base_metalness=0.0,
                                 specular_weight=0.0, coat_weight=0.0))
    sky = img[0, 0].mean()
    center = img[6, 12].mean()
    assert sky > 0.15
    # Single-scatter Oren-Nayar/diffuse lobe is not perfectly energy
    # conserving under the slab walk; allow a wider band than the pure
    # Lambertian furnace.
    assert 0.75 * sky < center < 1.1 * sky, (center, sky)


@pytest.mark.slow
def test_openpbr_metalness_darkens_with_base():
    bright = _render(_openpbr_scene(base_color=np.asarray([0.95, 0.95, 0.95]),
                                    base_metalness=1.0, specular_roughness=0.2),
                     rounds=200)
    dark = _render(_openpbr_scene(base_color=np.asarray([0.05, 0.05, 0.05]),
                                  base_metalness=1.0, specular_roughness=0.2),
                   rounds=200)
    assert bright[6, 12].mean() > dark[6, 12].mean() + 0.02


@pytest.mark.slow
def test_openpbr_emission_is_visible():
    scene = _openpbr_scene(base_color=np.zeros(3),
                           emission_color=np.asarray([1.0, 0.4, 0.1]),
                           emission_luminance=5.0,
                           specular_weight=0.0)
    scene.root.skybox_brightness = 0.0  # only the emitter lights the frame
    img = _render(scene, rounds=150)
    center = img[6, 12]
    corner = img[0, 0]
    assert center.mean() > 0.05, center
    assert corner.mean() < 0.01  # black sky
    assert center[0] > center[2]  # orange-ish emission


@pytest.mark.slow
def test_openpbr_coat_runs_and_is_finite():
    img = _render(_openpbr_scene(base_color=np.asarray([0.6, 0.1, 0.1]),
                                 coat_weight=1.0, coat_roughness=0.05,
                                 specular_roughness=0.4), rounds=150)
    assert np.isfinite(img).all()
    assert img.max() > 0.05


@pytest.mark.slow
def test_openpbr_emission_texture_modulates():
    """A black emission texture must kill the emission of a material
    whose base emission color is bright (the texture multiplies the
    emission reflectance; the reference packs this slot but never reads
    it -- we wire it through)."""
    from path_tracer_tpu.core.constants import TEXTURE_TYPE_REFLECTANCE_WITH_ALPHA

    def scene_with(tex_value):
        scene = Scene()
        pixels = np.full((8, 8, 3), tex_value, np.float32)
        tex = scene.create_texture(name='em', type=TEXTURE_TYPE_REFLECTANCE_WITH_ALPHA,
                                   pixels=pixels)
        mat = scene.create_material(
            MATERIAL_TYPE_OPENPBR,
            emission_color=np.asarray([1.0, 1.0, 1.0]),
            emission_luminance=5.0,
            emission_color_texture=tex)
        scene.create_entity(ENTITY_TYPE_SPHERE, material=mat,
                            transform=Transform(position=[0, 2.5, 0]))
        cam = scene.create_entity(
            ENTITY_TYPE_CAMERA,
            transform=Transform(position=[0, -1.5, 0],
                                rotation=[np.pi / 2, 0, 0]))
        cam.pinhole.field_of_view_in_degrees = 40.0
        return scene

    lit = _render(scene_with(1.0), rounds=60)
    dark = _render(scene_with(0.02), rounds=60)
    assert lit[6, 12].mean() > dark[6, 12].mean() + 0.1, (
        lit[6, 12].mean(), dark[6, 12].mean())
