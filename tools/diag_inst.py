"""On-chip pops diagnosis for the v6 instanced kernel.

Counts interior pops / leaf pops / while iterations / instance entries
on the viking hall for coherent primaries and REAL octant-sorted
mid-flight bounce rays, with the octant-ordered push vs the split-axis
flip. This is the v6 counterpart of tools/diag_trace.py (v5) and the
source of the README pops table.

Runtime rules: memory/tpu-runtime-rules.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import jax
import jax.numpy as jnp
import numpy as np

from path_tracer_tpu import RenderConfig, SceneLayout, compile_scene
from path_tracer_tpu.integrator import wavefront as wf
from path_tracer_tpu.ops import trace_inst
from path_tracer_tpu.ops.intersect import permute_rows, ray_sort_key
from path_tracer_tpu.scene.procedural import make_viking_hall_scene

WIDTH, HEIGHT = 1920, 1080


def run(packed, layout, o, d, t_in, oct_order, label, pop_cull=None):
    st = trace_inst.inst_trace(
        packed.inst_nodes, packed.inst_tris, packed.inst_rows,
        o, d, t_in, tlas_rows=layout.tlas_rows,
        oct_order=oct_order, pop_cull=pop_cull, stats=True)[5]
    st = np.asarray(st)
    n = o.shape[1]
    interior, leafp, iters, inst, culled = (int(x) for x in st)
    print(f'  {label:26s} interior {interior:8d}  leaf {leafp:8d}  '
          f'pops/ray {(interior + leafp) / n:.4f}  iters {iters}  '
          f'inst_enters {inst}  culled {culled}')
    return interior, leafp


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

    print(f'# viking sorted bounce rays ({n} lanes):')
    run(packed, layout, so, sd, t_in, False, 'axis-flip')
    run(packed, layout, so, sd, t_in, True, 'octant-ordered')

    fresh = wf.reset(packed, config, seed=1)
    po, pd = fresh['origin'], fresh['direction']
    perm = jnp.argsort(ray_sort_key(packed, po, pd))
    rows = permute_rows([po[0], po[1], po[2], pd[0], pd[1], pd[2]], perm)
    so = jnp.stack(rows[0:3], axis=0)
    sd = jnp.stack(rows[3:6], axis=0)
    print('# viking sorted primaries:')
    run(packed, layout, so, sd, t_in, False, 'axis-flip')
    run(packed, layout, so, sd, t_in, True, 'octant-ordered')


if __name__ == '__main__':
    main()
