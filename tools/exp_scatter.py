"""Scatter-stage ablation: where do viking's ~95 ms of scatter go?

Times the fused scatter+respawn step on a real mid-flight viking state
under layout variants that statically remove work (material models,
skybox texture taps), plus a null program to calibrate call overhead.

Run alone on the axon TPU.
"""

import dataclasses
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

WIDTH, HEIGHT = 1920, 1080
REPS = 6


def main():
    import jax
    import jax.numpy as jnp
    from path_tracer_tpu import RenderConfig, SceneLayout, compile_scene
    from path_tracer_tpu.core.constants import MATERIAL_TYPE_BASIC_DIFFUSE
    from path_tracer_tpu.core.sampling import Rng
    from path_tracer_tpu.integrator import wavefront as wf
    from path_tracer_tpu.integrator.scatter import scatter
    from path_tracer_tpu.integrator.state import merge_paths, new_paths
    from path_tracer_tpu.ops.intersect import trace
    from path_tracer_tpu.scene.procedural import (
        make_360_scene, make_viking_hall_scene)

    which = sys.argv[1] if len(sys.argv) > 1 else 'viking'
    if which == '360':
        scene, cam = make_360_scene(), 2
    else:
        scene, cam = make_viking_hall_scene(detail=1), 0
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)
    print(f'# scene {which}: material types {layout.material_types} '
          f'textured={layout.materials_textured}', file=sys.stderr)
    config = RenderConfig(width=WIDTH, height=HEIGHT, camera_model=cam)
    state = wf.render(packed, config, 4, seed=0, layout=layout)
    float(jnp.sum(state['accum']['count']))

    trace_jit = jax.jit(partial(trace, layout=layout))
    hit = trace_jit(packed, origin=state['origin'],
                    direction=state['direction'])
    float(jnp.sum(hit['time']))

    def make_step(lay):
        @jax.jit
        def step(path, origin, direction, hit, rng_state, lane, accum):
            rng = Rng(rng_state)
            term = jnp.float32(0.05)
            path, origin, direction, alive = scatter(
                packed, path, origin, direction, hit, rng, term, lay)
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

    variants = {
        'full': layout,
        'no_sky_tex': dataclasses.replace(layout, has_skybox_texture=False),
        'diffuse_only': dataclasses.replace(
            layout, material_types=(MATERIAL_TYPE_BASIC_DIFFUSE,)),
        'floor': dataclasses.replace(
            layout, has_skybox_texture=False,
            material_types=(MATERIAL_TYPE_BASIC_DIFFUSE,)),
    }

    @jax.jit
    def null(s):
        return jax.tree_util.tree_map(lambda x: x, s)

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
        print(f'# {label:14s} {dt*1e3:7.1f} ms', file=sys.stderr)
        return round(dt * 1e3, 1)

    results = {}
    results['null'] = timeit('null', null, state['accum'])
    for name, lay in variants.items():
        step = make_step(lay)
        results[name] = timeit(name, step, state['path'], state['origin'],
                               state['direction'], hit, state['rng_state'],
                               state['lane'], state['accum'])
    print(json.dumps(results))


if __name__ == '__main__':
    main()
