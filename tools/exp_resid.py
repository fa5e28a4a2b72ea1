"""Streaming residency sweep on the 1.62M-tri terrain: node/leaf
budget split and the VMEM table budget itself.

Config 6 runs at 3.74 Mrays/s (BENCH_r03) through the HBM-streaming
kernel. Two static knobs have never been swept on-chip (VERDICT
round-3 weak item 2):

  RES_NODES_FRAC          nodes' share of the resident budget (0.75
                          shipped untested; leaf-miss DMAs are the
                          cost the prefetch hides, node misses block)
  VMEM_TABLE_LIMIT_BYTES  64 MB shipped; v5e has 128 MB VMEM and the
                          kernel's other scratch is ~1 MB, so 80-96 MB
                          may fit and raise the resident fraction 25-50%

Measures kernel-only time on real mid-flight terrain rays (sorted,
like the production round feeds it) for each setting; flips module
globals and clears the jit cache between arms (residency is burned
into the program as static row counts).

Run alone on the axon TPU (memory/tpu-runtime-rules).
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
from path_tracer_tpu.scene.procedural import make_terrain_scene

WIDTH, HEIGHT = 1920, 1080
REPS = 3
MB = 1024 * 1024


def main():
    scene = make_terrain_scene(side=900)
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)
    config = RenderConfig(width=WIDTH, height=HEIGHT)
    print('# scene compiled', flush=True)
    state = wf.render(packed, config, 8, seed=0, layout=layout)
    o, d = state['origin'], state['direction']
    n = o.shape[1]
    key = jax.jit(lambda o, d: ray_sort_key(packed, o, d))(o, d)
    perm = jnp.argsort(key)
    rows = permute_rows([o[0], o[1], o[2], d[0], d[1], d[2],
                         jnp.full((n,), 1.0e7)], perm)
    so = jnp.stack(rows[0:3], axis=0)
    sd = jnp.stack(rows[3:6], axis=0)
    st = rows[6]
    float(jnp.sum(so))
    n_nodes = int(packed.inst_nodes.shape[0])
    n_tris = int(packed.inst_tris.shape[0])
    print(f'# terrain: {n_nodes} node rows + {n_tris} leaf rows '
          f'({(n_nodes + n_tris) * 512 / MB:.0f} MB of tables)', flush=True)

    all_arms = {
        'base':  [(64 * MB, 0.75)],   # shipped
        'frac':  [(64 * MB, 0.50), (64 * MB, 0.875)],
        'limit': [(96 * MB, 0.75), (112 * MB, 0.75)],
    }
    sel = os.environ.get('EXP_ARM', 'all')
    arms = (sum(all_arms.values(), []) if sel == 'all'
            else all_arms[sel])
    base_t = None
    for limit, frac in arms:
        trace_inst.VMEM_TABLE_LIMIT_BYTES = limit
        trace_inst.RES_NODES_FRAC = frac
        trace_inst._inst_trace.clear_cache()
        split = trace_inst.residency_split(
            packed.inst_nodes.shape, packed.inst_tris.shape,
            packed.inst_rows.shape)
        if split is None:
            print(f'#   limit {limit // MB} MB frac {frac}: declined',
                  flush=True)
            continue
        rn, rt = split
        label = (f'limit {limit // MB:3d} MB frac {frac:5.3f} '
                 f'(res {rn}/{n_nodes} nodes, {rt}/{n_tris} leaves)')
        try:
            tr = trace_inst.inst_trace(
                packed.inst_nodes, packed.inst_tris, packed.inst_rows,
                so, sd, st, tlas_rows=layout.tlas_rows)
            ref = float(jnp.sum(tr[0]))
            t0 = time.time()
            for _ in range(REPS):
                tr = trace_inst.inst_trace(
                    packed.inst_nodes, packed.inst_tris, packed.inst_rows,
                    so, sd, st, tlas_rows=layout.tlas_rows)
                float(jnp.sum(tr[0]))
            dt = (time.time() - t0) / REPS * 1e3
            if base_t is None:
                base_t = ref
            ok = abs(ref - base_t) / abs(base_t) < 1e-5
            print(f'#   {label}  {dt:8.1f} ms  {n / dt / 1e3:6.2f} Mrays/s '
                  f'{"ok" if ok else "HITS DIFFER"}', flush=True)
        except Exception as e:
            print(f'#   {label}  FAILED: {type(e).__name__}: {e}',
                  flush=True)
    trace_inst.VMEM_TABLE_LIMIT_BYTES = 64 * MB
    trace_inst.RES_NODES_FRAC = 0.75
    trace_inst._inst_trace.clear_cache()


if __name__ == '__main__':
    main()
