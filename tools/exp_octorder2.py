"""Post-oct_order shape re-sweep: interleave and packet height.

oct_order added ~28 scalar ops per interior pop (SMEM meta staging +
perm select tree). Interleave 2 was measured exactly flat before
(vector-issue-bound kernel), but the added scalar work could now hide
under the other packet's vector issue -- and the taller-packet knee
may have moved. Kernel-only on real octant-sorted viking bounce rays.

Runtime rules: memory/tpu-runtime-rules.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import jax
import jax.numpy as jnp

from path_tracer_tpu import RenderConfig, SceneLayout, compile_scene
from path_tracer_tpu.integrator import wavefront as wf
from path_tracer_tpu.ops import trace_inst
from path_tracer_tpu.ops.intersect import permute_rows, ray_sort_key
from path_tracer_tpu.scene.procedural import make_viking_hall_scene

WIDTH, HEIGHT = 1920, 1080
REPS = 6


def main():
    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)
    config = RenderConfig(width=WIDTH, height=HEIGHT)

    state = wf.render(packed, config, 4, seed=0, layout=layout)
    float(jnp.sum(state['accum']['count']))
    origin, direction = state['origin'], state['direction']
    n = origin.shape[1]
    t_in = jnp.full((n,), 1.0e7, jnp.float32)
    perm = jnp.argsort(ray_sort_key(packed, origin, direction))
    rows = permute_rows([origin[0], origin[1], origin[2],
                         direction[0], direction[1], direction[2]], perm)
    so = jnp.stack(rows[0:3], axis=0)
    sd = jnp.stack(rows[3:6], axis=0)

    shapes = [(24, 1), (24, 2), (16, 2), (32, 1), (16, 1), (8, 4), (40, 1)]
    if len(sys.argv) > 1:
        shapes = [tuple(int(x) for x in a.split('x')) for a in sys.argv[1:]]
    print(f'# viking sorted bounce rays ({n} lanes), oct_order on:')
    for rows_, il in shapes:
        def go():
            return trace_inst.inst_trace(
                packed.inst_nodes, packed.inst_tris, packed.inst_rows,
                so, sd, t_in, tlas_rows=layout.tlas_rows,
                packet_rows=rows_, interleave=il, oct_order=True)
        try:
            out = go()
            float(jnp.sum(out[0]))
            t0 = time.time()
            for _ in range(REPS):
                out = go()
                float(jnp.sum(out[0]))
            dt = (time.time() - t0) / REPS
            print(f'  rows={rows_:3d} interleave={il}: {dt * 1e3:8.1f} ms')
        except Exception as e:
            print(f'  rows={rows_:3d} interleave={il}: FAILED '
                  f'{str(e).splitlines()[0][:90]}')


if __name__ == '__main__':
    main()
