"""(a) Does forcing per-wave operand materialization restore the fast
gather path? (b) Do interleaved packets pay more pops than global-sort
packets?

exp_waves4: fwd per-wave+interleave = 99 ms at 4M lanes -- barely
better than the global 119 ms, not the ~2x10 ms the per-wave operand
size predicts. Hypothesis: XLA fuses the `waves[w]` slice into the
gather, so the gather operand is still the parent (N, 8) buffer and
the size cliff still applies. Variant A inserts
jax.lax.optimization_barrier around each wave slice to force a 64 MB
materialized copy. (b) runs inst_trace stats on interleave- vs
global-sorted rays to compare pops.

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
import numpy as np

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
    print(f'#   {label:26s} {dt:8.1f} ms', flush=True)
    return round(dt, 1)


def permute_rows_waves_barrier(rows, perm_w):
    """permute_rows_waves forward with a materialization barrier per
    wave slice (candidate fix for the fused-slice slow gather)."""
    k = len(rows)
    width = -(-k // 8) * 8
    n = rows[0].shape[0]
    w_count, n1 = perm_w.shape
    cast = [r if r.dtype == jnp.float32
            else jax.lax.bitcast_convert_type(r, jnp.float32) for r in rows]
    matrix = jnp.stack(
        cast + [jnp.zeros(n, jnp.float32)] * (width - k), axis=0)
    waves = matrix.T.reshape(w_count, n1, width)
    parts = []
    for w in range(w_count):
        opnd = jax.lax.optimization_barrier(waves[w])
        parts.append(jnp.take(opnd, perm_w[w], axis=0))
    flat = jnp.moveaxis(jnp.stack(parts, axis=0), 0, 1).reshape(n, width)
    out = flat.T
    return [out[i] if rows[i].dtype == jnp.float32
            else jax.lax.bitcast_convert_type(out[i], rows[i].dtype)
            for i in range(k)]


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

        @jax.jit
        def fwd_barrier(o, d, t, key):
            perm_w = jnp.argsort(key.reshape(waves, n1), axis=1)
            return permute_rows_waves_barrier(
                [o[0], o[1], o[2], d[0], d[1], d[2], t], perm_w)

        res['fwd_waves'] = timed('fwd per-wave (fused)', fwd_waves,
                                 o, d, t_in, key)
        res['fwd_barrier'] = timed('fwd per-wave (barrier)', fwd_barrier,
                                   o, d, t_in, key)

        # (b) pops: interleaved vs global-sorted rays.
        rows_i = fwd_barrier(o, d, t_in, key)
        oi = jnp.stack(rows_i[0:3], axis=0)
        di = jnp.stack(rows_i[3:6], axis=0)
        perm = jnp.argsort(key)
        rows_g = permute_rows(
            [o[0], o[1], o[2], d[0], d[1], d[2], t_in], perm)
        og = jnp.stack(rows_g[0:3], axis=0)
        dg = jnp.stack(rows_g[3:6], axis=0)
        for label, (oo, dd, tt) in (('inter', (oi, di, rows_i[6])),
                                    ('global', (og, dg, rows_g[6]))):
            st = trace_inst.inst_trace(
                packed.inst_nodes, packed.inst_tris, packed.inst_rows,
                oo, dd, tt, tlas_rows=layout.tlas_rows, stats=True)
            c = np.asarray(st[5])
            print(f'#   pops {label:7s} interior {int(c[0]):9d} '
                  f'leaf {int(c[1]):9d}  pops/ray '
                  f'{(int(c[0]) + int(c[1])) / n:.4f}', flush=True)
            res[f'pops_{label}'] = int(c[0]) + int(c[1])
        out[f'waves{waves}'] = res
        del state
    print(json.dumps(out))


if __name__ == '__main__':
    main()
