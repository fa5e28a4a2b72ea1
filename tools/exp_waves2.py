"""Stage breakdown of the fused round at waves > 1: where did the
kernel-side density win go?

tools/exp_density.py: sorted-bounce KERNEL throughput rises 18.8 ->
25.7 -> 32.7 Mrays/s at D = 1/2/4. tools/exp_waves.py: END-TO-END
viking throughput FALLS 15.2 -> 11.3 at waves=2 -- the non-kernel
share of the round jumped from ~26 ms to ~205 ms per 2x lanes. This
tool times each stage of the production round per waves level on real
steady-state viking states to locate the super-linear stage.

Run alone on the axon TPU (memory/tpu-runtime-rules).
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import jax
import jax.numpy as jnp

from path_tracer_tpu import RenderConfig, SceneLayout, compile_scene
from path_tracer_tpu.core.sampling import Rng
from path_tracer_tpu.integrator import wavefront as wf
from path_tracer_tpu.integrator.scatter import scatter
from path_tracer_tpu.integrator.state import merge_paths, new_paths
from path_tracer_tpu.ops.intersect import trace
from path_tracer_tpu.scene.procedural import make_viking_hall_scene

WIDTH, HEIGHT = 1920, 1080
REPS = 5


def timed(label, fn, *args, **kwargs):
    out = fn(*args, **kwargs)
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, 'dtype')]
    float(jnp.sum(leaves[0].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args, **kwargs)
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, 'dtype')]
        float(jnp.sum(leaves[0].astype(jnp.float32)))
    dt = (time.time() - t0) / REPS
    print(f'#   {label:28s} {dt*1e3:8.1f} ms', file=sys.stderr)
    return round(dt * 1e3, 1)


def main():
    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)
    out = {}
    for waves in (1, 2, 4):
        config = RenderConfig(width=WIDTH, height=HEIGHT, waves=waves)
        state = wf.render(packed, config, 24, seed=0, layout=layout)
        float(jnp.sum(state['accum']['count']))
        print(f'# waves={waves} ({waves * WIDTH * HEIGHT} lanes)',
              file=sys.stderr)
        res = {}

        trace_sorted = jax.jit(partial(trace, layout=layout,
                                       sort_packets=True))
        res['trace_sorted'] = timed(
            'trace (in-trace sort)',
            lambda: trace_sorted(packed, origin=state['origin'],
                                 direction=state['direction']))
        trace_plain = jax.jit(partial(trace, layout=layout))
        res['trace_plain'] = timed(
            'trace (unsorted)',
            lambda: trace_plain(packed, origin=state['origin'],
                                direction=state['direction']))

        hit = trace_sorted(packed, origin=state['origin'],
                           direction=state['direction'])

        @jax.jit
        def scatter_respawn(path, origin, direction, hit, rng_state, lane,
                            accum):
            rng = Rng(rng_state)
            term = jnp.float32(0.05)
            path, origin, direction, alive = scatter(
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

        res['scatter'] = timed(
            'scatter+respawn',
            lambda: scatter_respawn(state['path'], state['origin'],
                                    state['direction'], hit,
                                    state['rng_state'], state['lane'],
                                    state['accum']))

        render_nodonate = jax.jit(
            wf.render_rounds,
            static_argnames=('layout', 'config', 'rounds',
                             'sort_each_round'))
        res['round_sorted'] = timed(
            'full round (fused sort)', render_nodonate, packed, layout,
            config, state, jnp.float32(0.05), rounds=1,
            sort_each_round=True)
        res['round_unsorted'] = timed(
            'full round (no sort)', render_nodonate, packed, layout,
            config, state, jnp.float32(0.05), rounds=1)
        n = waves * WIDTH * HEIGHT
        res['mrays_sorted'] = round(n / res['round_sorted'] / 1e3, 2)
        res['mrays_unsorted'] = round(n / res['round_unsorted'] / 1e3, 2)
        print(f'#   -> sorted {res["mrays_sorted"]} / unsorted '
              f'{res["mrays_unsorted"]} Mrays/s', file=sys.stderr)
        out[f'waves{waves}'] = res
        del state
    print(json.dumps(out))


if __name__ == '__main__':
    main()
