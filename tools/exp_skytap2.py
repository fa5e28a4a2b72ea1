"""Skybox-tap split measured INSIDE the full scatter step.

tools/exp_skytap.py's isolated micro-kernels were swamped by ~30 ms
dispatch variance; this patches scatter.sample_skybox_radiance with
piecewise variants and times the production scatter+respawn step under
each (same methodology as tools/exp_scatter.py, whose no_sky_tex row
bounds the whole tap at ~21 ms on viking):

  prod        the real tap (equirect + quad gather + sigmoid)
  fixed_uv    skip arctan2/arcsin (uv from linear direction math)
  no_gather   skip the (N, 16) atlas_quad row gather (texel = f(uv))
  no_sigmoid  skip the 4-lambda sigmoid evaluation (spectrum passthru)

Run alone on the axon TPU.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

WIDTH, HEIGHT = 1920, 1080
REPS = 10


def main():
    import jax
    import jax.numpy as jnp
    from path_tracer_tpu import RenderConfig, SceneLayout, compile_scene
    from path_tracer_tpu.core.constants import PI, TAU
    from path_tracer_tpu.core.sampling import Rng
    from path_tracer_tpu.core.spectrum import sample_parametric_spectrum_scaled
    from path_tracer_tpu.integrator import scatter as sc
    from path_tracer_tpu.integrator import wavefront as wf
    from path_tracer_tpu.integrator.state import merge_paths, new_paths
    from path_tracer_tpu.models.common import sample_texture
    from path_tracer_tpu.ops.intersect import trace
    from path_tracer_tpu.scene.procedural import make_viking_hall_scene

    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)
    config = RenderConfig(width=WIDTH, height=HEIGHT)
    state = wf.render(packed, config, 4, seed=0, layout=layout)
    float(jnp.sum(state['accum']['count']))
    hit = jax.jit(partial(trace, layout=layout))(
        packed, origin=state['origin'], direction=state['direction'])
    float(jnp.sum(hit['time']))

    real_tap = sc.sample_skybox_radiance

    def tap_fixed_uv(packed_, direction, lam, has_texture=True,
                     atlas_size=8, filter_modes=(True, True),
                     use_quad=False):
        uv = jnp.stack([0.5 + 0.3 * direction[0],
                        0.5 + 0.3 * direction[2]], axis=0)
        meta = jax.lax.dynamic_slice_in_dim(
            packed_.texture_meta, packed_.skybox_texture_index,
            1, 0)[0][:, None]
        spec = sample_texture(packed_, None, uv, atlas_size, filter_modes,
                              use_quad, meta=meta)
        return (sample_parametric_spectrum_scaled(spec, lam)
                * packed_.skybox_brightness)

    def tap_no_gather(packed_, direction, lam, has_texture=True,
                      atlas_size=8, filter_modes=(True, True),
                      use_quad=False):
        phi = jnp.arctan2(direction[1], direction[0])
        theta = jnp.arcsin(jnp.clip(direction[2], -1.0, 1.0))
        u = 0.5 + phi / TAU
        v = 0.5 + theta / PI
        spec = jnp.stack([u * 0.1, v * 0.1, u + v, jnp.ones_like(u)], axis=0)
        return (sample_parametric_spectrum_scaled(spec, lam)
                * packed_.skybox_brightness)

    def tap_no_sigmoid(packed_, direction, lam, has_texture=True,
                       atlas_size=8, filter_modes=(True, True),
                       use_quad=False):
        phi = jnp.arctan2(direction[1], direction[0])
        theta = jnp.arcsin(jnp.clip(direction[2], -1.0, 1.0))
        uv = jnp.stack([0.5 + phi / TAU, 0.5 + theta / PI], axis=0)
        meta = jax.lax.dynamic_slice_in_dim(
            packed_.texture_meta, packed_.skybox_texture_index,
            1, 0)[0][:, None]
        spec = sample_texture(packed_, None, uv, atlas_size, filter_modes,
                              use_quad, meta=meta)
        return spec * packed_.skybox_brightness

    def make_step():
        @jax.jit
        def step(path, origin, direction, hit, rng_state, lane, accum):
            rng = Rng(rng_state)
            term = jnp.float32(0.05)
            path, origin, direction, alive = sc.scatter(
                packed, path, origin, direction, hit, rng, term, layout)
            dead = ~alive
            xyz = accum['xyz'] + jnp.where(dead, path['sample'], 0.0)
            count = accum['count'] + dead.astype(jnp.float32)
            fresh, co, cd = new_paths(packed, config.camera_index,
                                      config.camera_model, config.width,
                                      config.height, rng, config.flags, lane)
            path = merge_paths(path, fresh, dead)
            origin = jnp.where(dead, co, origin)
            direction = jnp.where(dead, cd, direction)
            return path, origin, direction, dict(xyz=xyz, count=count)
        return step

    def timeit(label, fn, *args):
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))
        t0 = time.time()
        for _ in range(REPS):
            out = fn(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(jnp.sum(leaf.astype(jnp.float32)))
        dt = (time.time() - t0) / REPS
        print(f'# {label:12s} {dt*1e3:7.1f} ms', file=sys.stderr)
        return round(dt * 1e3, 1)

    args = (state['path'], state['origin'], state['direction'], hit,
            state['rng_state'], state['lane'], state['accum'])
    results = {}
    for name, tap in (('prod', real_tap), ('fixed_uv', tap_fixed_uv),
                      ('no_gather', tap_no_gather),
                      ('no_sigmoid', tap_no_sigmoid)):
        sc.sample_skybox_radiance = tap
        results[name] = timeit(name, make_step(), *args)
    sc.sample_skybox_radiance = real_tap
    print(json.dumps(results))


if __name__ == '__main__':
    main()
