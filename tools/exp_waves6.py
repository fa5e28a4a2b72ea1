"""Row-granular interleave cost + chunk-local repair: does W=4 recover
global-sort pops with small-operand passes only?

Pieces (real mid-flight viking waves states, 1080p):
  fwd/inv        permute_rows_waves after the row-granular rewrite
                 (the lane-granular moveaxis cost ~50 ms at 4M lanes)
  repair_s1/s2   chunk-local re-sort of the interleaved stream by key
                 (argsort within 32768-lane chunks + take_along_axis),
                 spelled lane-major (s1) vs minor-axis (s2)
  pops           interleave alone vs interleave+repair vs global sort
  kernel         inst_trace on each ordering

Motivation: rank alignment noise across iid waves is ~sqrt(n1) ranks;
at W=4 that exceeds a packet's 768-rank span and cost +45% pops
(tools/exp_waves5.py). The merge displacement is bounded by the same
noise, so a chunk-local exact re-sort (chunk >> W * sqrt(n1) lanes)
reconstructs the global order except at chunk boundaries.

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
CHUNK = 30720  # 10 packets; divides 1080p wave multiples (3072 * 675 * W)


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
    print(f'#   {label:24s} {dt:8.1f} ms', flush=True)
    return round(dt, 1)


def row_interleave_1d(x, w_count, n1):
    rows1 = n1 // 128
    return (x.reshape(w_count, rows1, 128).swapaxes(0, 1)
            .reshape(w_count * n1))


def pops(label, packed, layout, o, d, t, n):
    st = trace_inst.inst_trace(
        packed.inst_nodes, packed.inst_tris, packed.inst_rows,
        o, d, t, tlas_rows=layout.tlas_rows, stats=True)
    c = np.asarray(st[5])
    total = int(c[0]) + int(c[1])
    print(f'#   pops {label:19s} {total:9d}  pops/ray {total / n:.4f}',
          flush=True)
    return total


def main():
    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)
    out = {}
    for waves in (int(os.environ.get('EXP_WAVES', 4)),):
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
        def fwd(o, d, t, key):
            perm_w = jnp.argsort(key.reshape(waves, n1), axis=1)
            return permute_rows_waves(
                [o[0], o[1], o[2], d[0], d[1], d[2], t], perm_w)

        @jax.jit
        def inv(o, key):
            perm_w = jnp.argsort(key.reshape(waves, n1), axis=1)
            inv_w = jnp.argsort(perm_w, axis=1)
            return permute_rows_waves([o[0], o[1], o[2], o[0], o[1]],
                                      inv_w, inverse=True)

        res['fwd'] = timed('fwd row-granular', fwd, o, d, t_in, key)
        res['inv'] = timed('inv row-granular', inv, o, key)

        @jax.jit
        def keyi(key):
            perm_w = jnp.argsort(key.reshape(waves, n1), axis=1)
            ks = jnp.take_along_axis(key.reshape(waves, n1), perm_w, axis=1)
            return row_interleave_1d(ks.reshape(-1), waves, n1)

        ki = keyi(key)
        nc = n // CHUNK

        @jax.jit
        def repair_s1(rows7, ki):
            perm2 = jnp.argsort(ki.reshape(nc, CHUNK), axis=1)
            m = jnp.stack(list(rows7) + [rows7[0]], axis=0)  # (8, N)
            flat = m.T.reshape(nc, CHUNK, 8)
            fixed = jnp.take_along_axis(flat, perm2[..., None], axis=1)
            return fixed.reshape(n, 8).T

        @jax.jit
        def repair_s2(rows7, ki):
            perm2 = jnp.argsort(ki.reshape(nc, CHUNK), axis=1)
            m = jnp.stack(list(rows7) + [rows7[0]], axis=0)  # (8, N)
            x = m.reshape(8, nc, CHUNK)
            fixed = jnp.take_along_axis(x, perm2[None], axis=2)
            return fixed.reshape(8, n)

        rows_i = fwd(o, d, t_in, key)
        res['repair_s1'] = timed('repair s1 lane-major', repair_s1,
                                 rows_i, ki)
        res['repair_s2'] = timed('repair s2 minor-axis', repair_s2,
                                 rows_i, ki)

        oi = jnp.stack(rows_i[0:3], axis=0)
        di = jnp.stack(rows_i[3:6], axis=0)
        fixed = repair_s1(rows_i, ki)
        orp = fixed[0:3]
        drp = fixed[3:6]
        trp = fixed[6]

        perm = jnp.argsort(key)
        rows_g = permute_rows([o[0], o[1], o[2], d[0], d[1], d[2], t_in],
                              perm)
        og = jnp.stack(rows_g[0:3], axis=0)
        dg = jnp.stack(rows_g[3:6], axis=0)

        res['pops_inter'] = pops('interleave', packed, layout,
                                 oi, di, rows_i[6], n)
        res['pops_repair'] = pops('inter+repair', packed, layout,
                                  orp, drp, trp, n)
        res['pops_global'] = pops('global', packed, layout,
                                  og, dg, rows_g[6], n)

        kern = jax.jit(partial(
            trace_inst.inst_trace, tlas_rows=layout.tlas_rows))
        res['kernel_repair'] = timed(
            'kernel inter+repair', lambda: kern(
                packed.inst_nodes, packed.inst_tris, packed.inst_rows,
                orp, drp, trp))
        out[f'waves{waves}'] = res
        del state
    print(json.dumps(out))


if __name__ == '__main__':
    main()
