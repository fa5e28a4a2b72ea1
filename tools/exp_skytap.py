"""Skybox-tap cost split: equirect math vs quad gather vs sigmoid.

The scatter ablation (tools/exp_scatter.py) shows the per-round skybox
radiance tap is ~21 of viking's ~28 ms scatter stage -- it runs for
EVERY lane every round (the reference does the same per thread,
basic_scatter.glsl:165-172). This isolates where those ms go at 2M
lanes: (a) the full tap, (b) fixed uv (drops arctan2/arcsin), (c)
fixed texel (drops the (N, 16) atlas_quad row gather), (d) raw
spectrum (drops the sigmoid 4-lambda evaluation).

Run alone on the axon TPU.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

REPS = 8


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from path_tracer_tpu import RenderConfig, SceneLayout, compile_scene
    from path_tracer_tpu.core.constants import PI, TAU
    from path_tracer_tpu.core.spectrum import sample_parametric_spectrum_scaled
    from path_tracer_tpu.integrator import wavefront as wf
    from path_tracer_tpu.integrator.scatter import sample_skybox_radiance
    from path_tracer_tpu.models.common import sample_texture
    from path_tracer_tpu.scene.procedural import make_viking_hall_scene

    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=16 / 9)
    layout = SceneLayout.from_packed(packed)
    config = RenderConfig(width=1920, height=1080)
    state = wf.render(packed, config, 4, seed=0, layout=layout)
    float(jnp.sum(state['accum']['count']))
    from path_tracer_tpu.core.spectrum import hero_wavelength_cluster
    d = state['direction']
    lam = jax.jit(hero_wavelength_cluster)(state['path']['lambda0'])  # (4, N)
    n = d.shape[1]
    print(f'# atlas_size {layout.atlas_size} quad {layout.atlas_quad_fit} '
          f'quad rows {packed.atlas_quad.shape}', file=sys.stderr)

    kw = dict(atlas_size=layout.atlas_size,
              filter_modes=layout.texture_filter_modes,
              use_quad=layout.atlas_quad_fit)

    @jax.jit
    def full(d, lam):
        return sample_skybox_radiance(packed, d, lam, True, **kw)

    @jax.jit
    def fixed_uv(d, lam):
        # Depend on d so XLA cannot hoist the tap out entirely.
        uv = jnp.stack([0.25 + 1e-9 * d[0], 0.5 + 1e-9 * d[1]], axis=0)
        meta = jax.lax.dynamic_slice_in_dim(
            packed.texture_meta, packed.skybox_texture_index, 1, 0)[0][:, None]
        spec = sample_texture(packed, None, uv, layout.atlas_size,
                              layout.texture_filter_modes,
                              layout.atlas_quad_fit, meta=meta)
        return sample_parametric_spectrum_scaled(spec, lam)

    @jax.jit
    def fixed_texel(d, lam):
        phi = jnp.arctan2(d[1], d[0])
        theta = jnp.arcsin(jnp.clip(d[2], -1.0, 1.0))
        u = 0.5 + phi / TAU
        v = 0.5 + theta / PI
        spec = jnp.stack([u, v, u + v, jnp.ones(n)], axis=0)
        return sample_parametric_spectrum_scaled(spec, lam)

    @jax.jit
    def no_sigmoid(d, lam):
        phi = jnp.arctan2(d[1], d[0])
        theta = jnp.arcsin(jnp.clip(d[2], -1.0, 1.0))
        uv = jnp.stack([0.5 + phi / TAU, 0.5 + theta / PI], axis=0)
        meta = jax.lax.dynamic_slice_in_dim(
            packed.texture_meta, packed.skybox_texture_index, 1, 0)[0][:, None]
        spec = sample_texture(packed, None, uv, layout.atlas_size,
                              layout.texture_filter_modes,
                              layout.atlas_quad_fit, meta=meta)
        return spec * lam[0]

    @jax.jit
    def null(d, lam):
        return d[0] + lam

    results = {}
    for name, fn in (('null', null), ('full', full), ('fixed_uv', fixed_uv),
                     ('fixed_texel', fixed_texel),
                     ('no_sigmoid', no_sigmoid)):
        out = fn(d, lam)
        float(jnp.sum(out))
        t0 = time.time()
        for _ in range(REPS):
            out = fn(d, lam)
            float(jnp.sum(out))
        dt = (time.time() - t0) / REPS
        results[name] = round(dt * 1e3, 1)
        print(f'# {name:12s} {dt*1e3:7.1f} ms', file=sys.stderr)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
