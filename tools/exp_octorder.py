"""A/B: octant-ordered child pushes vs the split-axis flip (v6 kernel).

oct_order pushes children in the precomputed per-octant far-first
order (scene/bvh8.py write_octant_perms) so pops run front-to-back in
all 3 axes; the baseline orders by the single build-time split axis.
Better pop order tightens the running t sooner -> fewer pops. The
scalar cost is ~28 extra scalar ops/pop (SMEM meta staging + a
7-select perm tree, see trace_inst.py interior()).

Measures kernel-only time on REAL octant-sorted mid-flight bounce rays
(the production workload shape) plus coherent primaries, and checks
hit agreement between the two orders.

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
REPS = 6


def kernel_only(packed, layout, origin, direction, t_in, oct_order):
    return trace_inst.inst_trace(
        packed.inst_nodes, packed.inst_tris, packed.inst_rows,
        origin, direction, t_in, tlas_rows=layout.tlas_rows,
        oct_order=oct_order)


def timed(label, fn, *args):
    out = fn(*args)
    float(jnp.sum(out[0]))
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
        float(jnp.sum(out[0]))
    dt = (time.time() - t0) / REPS
    print(f'  {label:28s} {dt * 1e3:8.1f} ms')
    return out, dt


def main():
    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)
    config = RenderConfig(width=WIDTH, height=HEIGHT)

    # Real mid-flight rays: 4 warmup rounds, then take the state.
    state = wf.render(packed, config, 4, seed=0, layout=layout)
    float(jnp.sum(state['accum']['count']))
    origin, direction = state['origin'], state['direction']
    n = origin.shape[1]
    t_in = jnp.full((n,), 1.0e7, jnp.float32)

    # Octant-Morton sort, as trace() feeds the kernel in production.
    perm = jnp.argsort(ray_sort_key(packed, origin, direction))
    rows = permute_rows([origin[0], origin[1], origin[2],
                         direction[0], direction[1], direction[2]], perm)
    so = jnp.stack(rows[0:3], axis=0)
    sd = jnp.stack(rows[3:6], axis=0)

    jit = jax.jit(kernel_only, static_argnames=('layout', 'oct_order'))
    print(f'# viking bounce rays ({n} lanes), kernel-only:')
    base, tb = timed('axis-flip (baseline)', jit, packed, layout,
                     so, sd, t_in, False)
    ordd, to = timed('octant-ordered', jit, packed, layout,
                     so, sd, t_in, True)
    agree = float(jnp.mean(jnp.abs(base[0] - ordd[0])
                           <= 1e-5 * jnp.abs(base[0]) + 1e-6))
    face_agree = float(jnp.mean((base[1] == ordd[1]).astype(jnp.float32)))
    print(f'  t agree {agree:.6f}, face agree {face_agree:.6f} '
          f'(tie-order differences only), speedup {tb / to:.3f}x')

    # Coherent primaries.
    fresh = wf.reset(packed, config, seed=1)
    po, pd = fresh['origin'], fresh['direction']
    perm = jnp.argsort(ray_sort_key(packed, po, pd))
    rows = permute_rows([po[0], po[1], po[2], pd[0], pd[1], pd[2]], perm)
    so = jnp.stack(rows[0:3], axis=0)
    sd = jnp.stack(rows[3:6], axis=0)
    print('# viking primaries, kernel-only:')
    _, tb = timed('axis-flip (baseline)', jit, packed, layout,
                  so, sd, t_in, False)
    _, to = timed('octant-ordered', jit, packed, layout,
                  so, sd, t_in, True)
    print(f'  speedup {tb / to:.3f}x')


if __name__ == '__main__':
    main()
