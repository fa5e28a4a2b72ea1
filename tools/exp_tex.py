"""Texture-tap cost on the textured flagship: where did 15.2 -> 8.8
Mrays/s go, and does the quad atlas win it back?

The round-4 honest workload (1024^2 wood grain + 2048x1024 sky) packs
a 2048^2 atlas whose QUAD table (one-gather bilinear) is 256 MB --
over the 128 MB ATLAS_QUAD_LIMIT_BYTES -- so every tap pays 4 corner
gathers from the 64 MB flat atlas. Arms, all on the production fused
sorted round (1080p, steady-state):

  prod             4-gather taps (shipped)
  quad512          ATLAS_QUAD_LIMIT raised to 512 MB: 1 gather/tap
                   from a 256 MB operand (past the XLA gather cliff --
                   which side wins is exactly the question)
  no_wood          wood tap patched to constant (isolates mesh-hit tap)
  no_sky_tap       sky radiance constant (isolates the equirect taps)

Run alone on the axon TPU (memory/tpu-runtime-rules).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import dataclasses

import jax
import jax.numpy as jnp

from path_tracer_tpu import RenderConfig, SceneLayout, compile_scene
from path_tracer_tpu.integrator import scatter as sc
from path_tracer_tpu.integrator import wavefront as wf
from path_tracer_tpu.scene import compile as compile_mod
from path_tracer_tpu.scene.procedural import make_viking_hall_scene

WIDTH, HEIGHT = 1920, 1080
REPS = 6


def main():
    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)
    config = RenderConfig(width=WIDTH, height=HEIGHT)
    state = wf.render(packed, config, 24, seed=0, layout=layout)
    float(jnp.sum(state['accum']['count']))

    def make_round(lay, pk):
        return jax.jit(
            lambda s, t: wf.render_rounds(pk, lay, config, s, t, rounds=1,
                                          sort_each_round=True))

    def timeit(label, fn, s):
        out = fn(s, jnp.float32(0.05))
        float(jnp.sum(out['accum']['count']))
        t0 = time.time()
        for _ in range(REPS):
            out = fn(s, jnp.float32(0.05))
            float(jnp.sum(out['accum']['count']))
        dt = (time.time() - t0) / REPS * 1e3
        print(f'#   {label:12s} {dt:7.1f} ms/round '
              f'({WIDTH * HEIGHT / dt / 1e3:.2f} Mrays/s)', flush=True)
        return round(dt, 1)

    arm = os.environ.get('EXP_ARM', 'all')
    results = {}
    if arm in ('all', 'prod'):
        results['prod'] = timeit('prod', make_round(layout, packed), state)

    if arm in ('all', 'ablate'):
        # no_wood: drop the base tap from the textured attribute set.
        lay_nw = dataclasses.replace(
            layout, textured_attrs=tuple(
                a for a in layout.textured_attrs if a != 'base'))
        results['no_wood'] = timeit('no_wood', make_round(lay_nw, packed),
                                    state)
        real_tap = sc.sample_skybox_radiance

        def tap_const(packed_, direction, lam, has_texture=True,
                      atlas_size=8, filter_modes=(True, True),
                      use_quad=False):
            return real_tap(packed_, direction, lam, False)

        sc.sample_skybox_radiance = tap_const
        try:
            results['no_sky_tap'] = timeit(
                'no_sky_tap', make_round(layout, packed), state)
        finally:
            sc.sample_skybox_radiance = real_tap

    if arm not in ('all', 'quad'):
        print(json.dumps(results))
        return

    # quad512: repack the atlas quad with the limit raised.
    old_limit = compile_mod.ATLAS_QUAD_LIMIT_BYTES
    compile_mod.ATLAS_QUAD_LIMIT_BYTES = 512 * 1024 * 1024
    try:
        packed_q = compile_scene(make_viking_hall_scene(detail=1),
                                 aspect_ratio=WIDTH / HEIGHT)
    finally:
        compile_mod.ATLAS_QUAD_LIMIT_BYTES = old_limit
    layout_q = SceneLayout.from_packed(packed_q)
    print(f'# quad rows {packed_q.atlas_quad.shape} fit '
          f'{layout_q.atlas_quad_fit}', flush=True)
    state_q = wf.render(packed_q, config, 24, seed=0, layout=layout_q)
    float(jnp.sum(state_q['accum']['count']))
    results['quad512'] = timeit('quad512', make_round(layout_q, packed_q),
                                state_q)

    print(json.dumps(results))


if __name__ == '__main__':
    main()
