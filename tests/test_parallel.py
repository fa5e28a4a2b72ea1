"""Multi-device sharded rendering tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from path_tracer_tpu import RenderConfig, compile_scene, resolve
from path_tracer_tpu.parallel.render import make_mesh, render_sharded
from path_tracer_tpu.integrator.wavefront import render
from path_tracer_tpu.scene.procedural import make_cornell_scene


def test_virtual_device_count():
    assert jax.device_count() >= 8


def _accum_image(accum, w, h, lane=None):
    return np.asarray(resolve(accum, w, h, lane=lane))


@pytest.mark.slow
def test_pixel_sharded_matches_single_device():
    """Pixel sharding is a pure partition: same seeds, same lanes -> the
    sharded render must be bitwise-identical to the single-device one."""
    scene = make_cornell_scene()
    packed = compile_scene(scene, aspect_ratio=2.0)
    w, h, rounds = 32, 16, 24

    config = RenderConfig(width=w, height=h)
    single = render(packed, config, rounds, seed=5)
    img_single = _accum_image(single['accum'], w, h, lane=single['lane'])

    mesh = make_mesh(jax.devices()[:8], batch=1, pixels=8)
    accum = render_sharded(packed, config, rounds, mesh, seed=5)
    img_sharded = _accum_image(accum, w, h, lane=accum['lane'])

    np.testing.assert_allclose(img_sharded, img_single, atol=1e-6)


@pytest.mark.slow
def test_batch_sharding_accumulates_more_samples():
    scene = make_cornell_scene()
    packed = compile_scene(scene, aspect_ratio=2.0)
    w, h, rounds = 16, 8, 16
    config = RenderConfig(width=w, height=h)

    mesh = make_mesh(jax.devices()[:8], batch=4, pixels=2)
    accum = render_sharded(packed, config, rounds, mesh, seed=1)
    # 4 independent batch rows -> ~4x the samples of a single device.
    single = render(packed, config, rounds, seed=1)
    ratio = float(jnp.sum(accum['count'])) / max(float(jnp.sum(single['accum']['count'])), 1.0)
    assert 3.0 < ratio < 5.0, ratio
    # And the merged image is a valid render (finite, lit).
    img = _accum_image(accum, w, h)
    assert np.isfinite(img).all()
    assert img.max() > 0.01


@pytest.mark.slow
def test_batch_rows_decorrelated():
    scene = make_cornell_scene()
    packed = compile_scene(scene, aspect_ratio=2.0)
    w, h = 16, 8
    config = RenderConfig(width=w, height=h)
    mesh = make_mesh(jax.devices()[:8], batch=8, pixels=1)
    accum = render_sharded(packed, config, 20, mesh, seed=9)
    img8 = _accum_image(accum, w, h, lane=accum['lane'])
    single = render(packed, config, 20, seed=9)
    img1 = _accum_image(single['accum'], w, h, lane=single['lane'])
    # More samples -> lower noise: the 8-way image should differ from the
    # 1-way one (decorrelated streams actually contributed).
    assert np.abs(img8 - img1).max() > 1e-4
