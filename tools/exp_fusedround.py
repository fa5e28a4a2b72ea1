"""Fused-round ablations: what does a stage cost in the REAL program?

Standalone stage jits materialize their inputs/outputs and mislead
(tools/exp_skytap3.py: -15 ms standalone, production-neutral;
tools/exp_permute2.py: the permute transposes are free in the fused
round). This harness times the production fused sorted round on viking
with pieces patched out at trace time:

  prod         unmodified
  no_sky_tap   skybox radiance = constant spectrum (drops the equirect
               quad gather + sigmoid for every lane every round)
  no_mis       skybox light sampling off (drops the second BSDF eval)

Each arm gets a fresh jit wrapper (the patch is invisible to the jit
cache key). Interleaved twice to cancel relay drift.

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
    import dataclasses
    import jax
    import jax.numpy as jnp
    from path_tracer_tpu import RenderConfig, SceneLayout, compile_scene
    from path_tracer_tpu.integrator import scatter as sc
    from path_tracer_tpu.integrator import wavefront as wf
    from path_tracer_tpu.scene.procedural import make_viking_hall_scene

    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=16 / 9)
    layout = SceneLayout.from_packed(packed)
    config = RenderConfig(width=1920, height=1080)
    state = wf.render(packed, config, 24, seed=0, layout=layout)
    float(jnp.sum(state['accum']['count']))

    real_tap = sc.sample_skybox_radiance

    def tap_const(packed_, direction, lam, has_texture=True, atlas_size=8,
                  filter_modes=(True, True), use_quad=False):
        return real_tap(packed_, direction, lam, False)

    def make_round(lay):
        return jax.jit(
            lambda p, s, t: wf.render_rounds(p, lay, config, s, t,
                                             rounds=1,
                                             sort_each_round=True))

    def timeit(label, fn):
        out = fn(packed, state, jnp.float32(0.05))
        float(jnp.sum(out['accum']['count']))
        t0 = time.time()
        for _ in range(REPS):
            out = fn(packed, state, jnp.float32(0.05))
            float(jnp.sum(out['accum']['count']))
        dt = (time.time() - t0) / REPS
        print(f'# {label:12s} {dt*1e3:7.1f} ms/round', file=sys.stderr)
        return round(dt * 1e3, 1)

    no_mis = dataclasses.replace(layout, has_skybox_sampling=False)
    results = {}
    for rnd in range(2):
        sc.sample_skybox_radiance = real_tap
        results[f'prod{rnd}'] = timeit(f'prod{rnd}', make_round(layout))
        sc.sample_skybox_radiance = tap_const
        results[f'no_sky_tap{rnd}'] = timeit(f'no_sky_tap{rnd}',
                                             make_round(layout))
        sc.sample_skybox_radiance = real_tap
        results[f'no_mis{rnd}'] = timeit(f'no_mis{rnd}', make_round(no_mis))
    sc.sample_skybox_radiance = real_tap
    print(json.dumps(results))


if __name__ == '__main__':
    main()
