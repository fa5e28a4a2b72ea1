"""Pop-time reach culling A/B on the v6 kernel (real hardware).

Every push stores the child's packet-min entry in a parallel SMEM
stack; pops whose entry >= the packet's current max t are skipped
(ops/trace_inst.py POP_CULL). The far-first octant ordering already
cuts push-time work; this catches the already-pushed far subtrees that
went stale while nearer geometry tightened t.

Structural limit: the cull key is packet-AGGREGATE (min entry vs max
t), so a packet containing even one miss ray (t stays at the horizon)
never culls.

Measures pops + kernel-only wall time on REAL sorted mid-flight bounce
rays and sorted primaries, cull off vs on, then end-to-end viking
Mrays/s both ways.

MEASURED 2026-08-18 (v5e, viking, steady-state sorted rays) -- a
decisive NEGATIVE, POP_CULL defaults False:

    bounce:   culled 137 of 180k pops (0.08%); kernel 131.8 -> 151.0 ms
    primary:  culled 471 of 21k pops (2.2%);   kernel  39.4 ->  40.7 ms
    end-to-end: 1.000x (11.96 Mrays/s both arms)

Two independent causes: (1) nearly every packet contains at least one
ray that misses everything (viking's windows/openings), so t_max sits
at the horizon and the aggregate test cannot fire; (2) the far-first
octant-ordered pushes already process near subtrees first, so few
pushed entries go stale. And the bookkeeping is NOT free: the
(8,1)->(8,128) broadcast-store + 8 scalar loads per interior pop cost
+15% kernel-only on bounce rays (scalar work does not hide under the
vector-bound pop on this core).

Runtime rules: memory/tpu-runtime-rules (one process, readback to time).
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


def pops(packed, layout, o, d, t_in, pop_cull, label):
    st = trace_inst.inst_trace(
        packed.inst_nodes, packed.inst_tris, packed.inst_rows,
        o, d, t_in, tlas_rows=layout.tlas_rows,
        pop_cull=pop_cull, stats=True)[5]
    st = np.asarray(st)
    interior, leafp, iters, inst, culled = (int(x) for x in st)
    print(f'  {label:22s} interior {interior:8d}  leaf {leafp:8d}  '
          f'culled {culled:8d}  iters {iters}', flush=True)
    return st


def kernel_time(packed, layout, o, d, t_in, pop_cull, label):
    def go():
        return trace_inst.inst_trace(
            packed.inst_nodes, packed.inst_tris, packed.inst_rows,
            o, d, t_in, tlas_rows=layout.tlas_rows, pop_cull=pop_cull)
    r = go()
    float(jnp.sum(r[0]))
    t0 = time.time()
    for _ in range(REPS):
        r = go()
        float(jnp.sum(r[0]))
    dt = (time.time() - t0) / REPS
    print(f'  {label:22s} kernel {dt*1e3:7.1f} ms', flush=True)
    return dt


def end_to_end(packed, layout, config, label):
    state = None
    for _ in range(2):
        state = wf.render(packed, config, 12, seed=0, layout=layout,
                          state=state)
    float(jnp.sum(state['accum']['count']))
    t0 = time.time()
    for _ in range(2):
        state = wf.render(packed, config, 12, layout=layout, state=state)
        jax.block_until_ready(state['accum']['xyz'])
    float(jnp.sum(state['accum']['count']))
    dt = time.time() - t0
    mrays = WIDTH * HEIGHT * 24 / dt / 1e6
    print(f'{label}: 24 rounds in {dt:.2f}s = {mrays:.2f} Mrays/s',
          flush=True)
    return mrays


def main():
    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)
    config = RenderConfig(width=WIDTH, height=HEIGHT)

    state = wf.render(packed, config, 24, seed=0, layout=layout)
    float(jnp.sum(state['accum']['count']))
    origin, direction = state['origin'], state['direction']
    n = origin.shape[1]
    t_in = jnp.full((n,), 1.0e7, jnp.float32)

    perm = jnp.argsort(ray_sort_key(packed, origin, direction))
    rows = permute_rows([origin[0], origin[1], origin[2],
                         direction[0], direction[1], direction[2]], perm)
    so = jnp.stack(rows[0:3], axis=0)
    sd = jnp.stack(rows[3:6], axis=0)

    print(f'# viking sorted steady-state bounce rays ({n} lanes):')
    pops(packed, layout, so, sd, t_in, False, 'cull OFF')
    pops(packed, layout, so, sd, t_in, True, 'cull ON')
    off = kernel_time(packed, layout, so, sd, t_in, False, 'cull OFF')
    on = kernel_time(packed, layout, so, sd, t_in, True, 'cull ON')
    print(f'  bounce kernel ratio ON/OFF = {on / off:.3f}')

    fresh = wf.reset(packed, config, seed=1)
    po, pd = fresh['origin'], fresh['direction']
    perm = jnp.argsort(ray_sort_key(packed, po, pd))
    rows = permute_rows([po[0], po[1], po[2], pd[0], pd[1], pd[2]], perm)
    so = jnp.stack(rows[0:3], axis=0)
    sd = jnp.stack(rows[3:6], axis=0)
    print('# viking sorted primaries:')
    pops(packed, layout, so, sd, t_in, False, 'cull OFF')
    pops(packed, layout, so, sd, t_in, True, 'cull ON')
    off = kernel_time(packed, layout, so, sd, t_in, False, 'cull OFF')
    on = kernel_time(packed, layout, so, sd, t_in, True, 'cull ON')
    print(f'  primary kernel ratio ON/OFF = {on / off:.3f}')

    # End-to-end through the production path (module switch). The
    # outer render jit's cache key does NOT include POP_CULL, so each
    # arm gets a distinct (semantically identical) config via
    # rounds_per_call, which this path never reads -- render() passes
    # rounds explicitly.
    saved = trace_inst.POP_CULL
    try:
        trace_inst.POP_CULL = False
        e_off = end_to_end(
            packed, layout,
            RenderConfig(width=WIDTH, height=HEIGHT, rounds_per_call=7),
            'viking e2e cull OFF')
        trace_inst.POP_CULL = True
        e_on = end_to_end(
            packed, layout,
            RenderConfig(width=WIDTH, height=HEIGHT, rounds_per_call=9),
            'viking e2e cull ON ')
    finally:
        trace_inst.POP_CULL = saved
    print(f'end-to-end ratio ON/OFF = {e_on / e_off:.3f}')


if __name__ == '__main__':
    main()
