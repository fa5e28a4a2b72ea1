"""Where do the extra ~63 ms/round go at waves=2 e2e?

exp_waves_e2e measured the production waves=2 path (per-wave sort +
barriered quantile interleave) at 10.4 Mrays/s vs 12.34 at waves=1 --
the kernel-side density win (exp_density: bounce kernel +37% at D=2)
does not show up. Round time 399 ms at 4.15M lanes vs 168 ms at 2.07M:
+63 ms over flat per-ray scaling. This decomposes a real waves=2
mid-flight state:

  key        ray_sort_key at 4.15M lanes
  argsorts   per-wave argsort + inverse (2 x 2.07M)
  fwd7       permute_rows_waves forward, 7 rows (barriered)
  inv5       permute_rows_waves inverse, 5 rows
  kern_il    inst_trace on interleave-ordered rays
  kern_gl    inst_trace on globally sorted rays (same state)
  pops       stats-mode pops for both orderings
  plus the same pieces on the waves=1 state for the per-ray baseline.

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
    print(f'#   {label:10s} {dt:8.1f} ms', file=sys.stderr, flush=True)
    return round(dt, 1)


def main():
    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)
    kern = jax.jit(partial(trace_inst.inst_trace, tlas_rows=layout.tlas_rows))
    stats = jax.jit(partial(trace_inst.inst_trace,
                            tlas_rows=layout.tlas_rows, stats=True))
    out = {}
    for waves in (1, 2):
        config = RenderConfig(width=WIDTH, height=HEIGHT, waves=waves)
        state = wf.render(packed, config, 24, seed=0, layout=layout)
        o, d = state['origin'], state['direction']
        n = o.shape[1]
        n1 = n // waves
        t_in = jnp.full((n,), 1.0e7)
        float(jnp.sum(state['accum']['count']))
        print(f'# waves={waves} ({n} lanes)', file=sys.stderr, flush=True)
        res = {}

        key_jit = jax.jit(lambda o, d: ray_sort_key(packed, o, d))
        res['key'] = timed('key', key_jit, o, d)

        @jax.jit
        def perms_w(o, d):
            key = ray_sort_key(packed, o, d).reshape(waves, n1)
            pw = jnp.argsort(key, axis=1)
            return pw, jnp.argsort(pw, axis=1)

        res['argsorts'] = timed('argsorts', perms_w, o, d)
        perm_w, inv_w = perms_w(o, d)

        @jax.jit
        def fwd7(o, d, t, perm_w):
            return permute_rows_waves(
                [o[0], o[1], o[2], d[0], d[1], d[2], t], perm_w)

        res['fwd7'] = timed('fwd7', fwd7, o, d, t_in, perm_w)
        rows = fwd7(o, d, t_in, perm_w)

        @jax.jit
        def inv5(rows, inv_w):
            return permute_rows_waves(rows[:5], inv_w, inverse=True)

        res['inv5'] = timed('inv5', inv5, rows, inv_w)

        so = jnp.stack(rows[0:3], axis=0)
        sd = jnp.stack(rows[3:6], axis=0)
        res['kern_il'] = timed(
            'kern_il', lambda: kern(packed.inst_nodes, packed.inst_tris,
                                    packed.inst_rows, so, sd, rows[6]))
        st = stats(packed.inst_nodes, packed.inst_tris, packed.inst_rows,
                   so, sd, rows[6])
        c = np.asarray(st[5])
        res['pops_il'] = round((int(c[0]) + int(c[1])) / n, 4)

        # Global sort of the same state for comparison.
        perm = jnp.argsort(key_jit(o, d))
        growz = jax.jit(lambda o, d, t, perm: permute_rows(
            [o[0], o[1], o[2], d[0], d[1], d[2], t], perm))
        res['fwd7_gl'] = timed('fwd7_gl', growz, o, d, t_in, perm)
        rows_g = growz(o, d, t_in, perm)
        so_g = jnp.stack(rows_g[0:3], axis=0)
        sd_g = jnp.stack(rows_g[3:6], axis=0)
        res['kern_gl'] = timed(
            'kern_gl', lambda: kern(packed.inst_nodes, packed.inst_tris,
                                    packed.inst_rows, so_g, sd_g, rows_g[6]))
        st = stats(packed.inst_nodes, packed.inst_tris, packed.inst_rows,
                   so_g, sd_g, rows_g[6])
        c = np.asarray(st[5])
        res['pops_gl'] = round((int(c[0]) + int(c[1])) / n, 4)

        out[f'waves{waves}'] = res
        del state
    print(json.dumps(out))


if __name__ == '__main__':
    main()
