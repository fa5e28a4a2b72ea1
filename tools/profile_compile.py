"""Break down compile/warmup cost per benchmark config on the real chip.

BENCH_r02 showed a pathological spread: Cornell (1 triangle!) took 550 s
of compile+warmup while configs 2-4 took ~20 s. This tool separates,
per config: host scene compile, jit trace/lower time, XLA (relay)
compile time, and first-execution time, for the exact programs bench.py
runs (reset + the fused CHUNK-round render program). It also compiles a
rounds=3 variant of config 1's program to measure the marginal cost of
a brand-new HLO vs a possibly relay-cached one.

Run with the default (axon) env; one python process at a time.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')


def main():
    import jax
    import jax.numpy as jnp
    from path_tracer_tpu import RenderConfig, SceneLayout, compile_scene
    from path_tracer_tpu.integrator import wavefront as wf
    from path_tracer_tpu.scene.procedural import (
        make_360_scene, make_cornell_scene, make_sphere_array_scene,
        make_viking_hall_scene)

    cases = [
        ('1_cornell', make_cornell_scene, 0),
        ('2_spheres_dof', make_sphere_array_scene, 1),
        ('3_viking_hall', lambda: make_viking_hall_scene(detail=1), 0),
        ('4_360_mixed', make_360_scene, 2),
    ]
    width, height = 1920, 1080
    out = {}
    for name, make, cam_model in cases:
        rec = {}
        t0 = time.time()
        scene = make()
        packed = compile_scene(scene, aspect_ratio=width / height)
        layout = SceneLayout.from_packed(packed)
        config = RenderConfig(width=width, height=height,
                              camera_model=cam_model)
        rec['scene_compile_s'] = round(time.time() - t0, 2)

        t0 = time.time()
        state = wf.reset(packed, config, seed=0)
        state = jax.block_until_ready(state)
        rec['reset_eager_s'] = round(time.time() - t0, 2)

        # Local NON-donating jit: the production wrappers donate the
        # render state, which this tool re-uses across program shapes.
        fn = jax.jit(partial(wf.render_rounds,
                             sort_each_round=wf.wants_sort(config, layout)),
                     static_argnames=('layout', 'config', 'rounds'))
        rec['sorted'] = wf.wants_sort(config, layout)
        term = jnp.float32(0.05)

        t0 = time.time()
        lowered = fn.lower(packed, layout, config, state, term, 2)
        rec['trace_lower_s'] = round(time.time() - t0, 2)
        t0 = time.time()
        compiled = lowered.compile()
        rec['xla_compile_s'] = round(time.time() - t0, 2)
        t0 = time.time()
        state2 = compiled(packed, state, term)
        val = float(jnp.sum(state2['accum']['count']))
        rec['first_exec_s'] = round(time.time() - t0, 2)

        if name == '1_cornell':
            # Marginal cost of a NEW program shape (rounds=3) in the
            # same process: distinguishes per-program compile cost from
            # one-time relay/session overheads.
            t0 = time.time()
            lowered3 = fn.lower(packed, layout, config, state, term, 3)
            compiled3 = lowered3.compile()
            rec['variant_rounds3_compile_s'] = round(time.time() - t0, 2)

        print(f'# {name}: {json.dumps(rec)}', file=sys.stderr)
        out[name] = rec
    print(json.dumps(out))


if __name__ == '__main__':
    main()
