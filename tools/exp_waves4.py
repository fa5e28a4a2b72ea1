"""Cost of the per-wave interleave permute vs the global permute, and
the kernel on interleave-sorted vs globally-sorted rays.

tools/exp_waves.py after the interleave fix: waves=2 e2e = 12.9 Mrays/s
-- better than the 11.3 of the global-sort path but still below
waves=1's 15.2, leaving ~40-60 ms per 2M lanes unexplained. This
isolates: fwd/inv permute_rows_waves vs permute_rows at the same lane
count, and inst_trace on rays sorted by (a) global argsort vs (b)
per-wave + interleave -- if (b) is slower, the quantile approximation
is costing pops; if the permutes are slower, it's the transposes.

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
from path_tracer_tpu.integrator import wavefront as wf
from path_tracer_tpu.ops import trace_inst
from path_tracer_tpu.ops.intersect import (
    permute_rows, permute_rows_waves, ray_sort_key)
from path_tracer_tpu.scene.procedural import make_viking_hall_scene

WIDTH, HEIGHT = 1920, 1080
REPS = 5


def timed(label, fn, *args):
    out = fn(*args)
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, 'dtype')]
    float(jnp.sum(leaves[0].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, 'dtype')]
        float(jnp.sum(leaves[0].astype(jnp.float32)))
    dt = (time.time() - t0) / REPS * 1e3
    print(f'#   {label:22s} {dt:8.1f} ms', flush=True)
    return round(dt, 1)


def main():
    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)
    out = {}
    for waves in (2, 4):
        config = RenderConfig(width=WIDTH, height=HEIGHT, waves=waves)
        state = wf.render(packed, config, 24, seed=0, layout=layout)
        o, d = state['origin'], state['direction']
        n = o.shape[1]
        n1 = n // waves
        t_in = jnp.full((n,), 1.0e7)
        float(jnp.sum(state['accum']['count']))
        print(f'# waves={waves} ({n} lanes)', flush=True)
        res = {}

        key = jax.jit(lambda o, d: ray_sort_key(packed, o, d))(o, d)

        @jax.jit
        def fwd_waves(o, d, t, key):
            perm_w = jnp.argsort(key.reshape(waves, n1), axis=1)
            return permute_rows_waves(
                [o[0], o[1], o[2], d[0], d[1], d[2], t], perm_w)

        res['fwd_waves'] = timed('fwd per-wave+inter', fwd_waves,
                                 o, d, t_in, key)

        @jax.jit
        def inv_waves(o, key):
            perm_w = jnp.argsort(key.reshape(waves, n1), axis=1)
            inv_w = jnp.argsort(perm_w, axis=1)
            rows = [o[0], o[1], o[2], o[0], o[1]]
            return permute_rows_waves(rows, inv_w, inverse=True)

        res['inv_waves'] = timed('inv per-wave+inter', inv_waves, o, key)

        @jax.jit
        def fwd_global(o, d, t, key):
            perm = jnp.argsort(key)
            return permute_rows(
                [o[0], o[1], o[2], d[0], d[1], d[2], t], perm)

        res['fwd_global'] = timed('fwd global', fwd_global, o, d, t_in, key)

        rows_i = fwd_waves(o, d, t_in, key)
        oi = jnp.stack(rows_i[0:3], axis=0)
        di = jnp.stack(rows_i[3:6], axis=0)
        rows_g = fwd_global(o, d, t_in, key)
        og = jnp.stack(rows_g[0:3], axis=0)
        dg = jnp.stack(rows_g[3:6], axis=0)

        kern = jax.jit(partial(
            trace_inst.inst_trace, tlas_rows=layout.tlas_rows))
        res['kernel_inter'] = timed(
            'kernel interleaved', lambda: kern(
                packed.inst_nodes, packed.inst_tris, packed.inst_rows,
                oi, di, rows_i[6]))
        res['kernel_global'] = timed(
            'kernel global-sort', lambda: kern(
                packed.inst_nodes, packed.inst_tris, packed.inst_rows,
                og, dg, rows_g[6]))
        out[f'waves{waves}'] = res
        del state
    print(json.dumps(out))


if __name__ == '__main__':
    main()
