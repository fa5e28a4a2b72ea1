"""Which op inside trace(sort_packets=True) goes super-linear beyond
2M lanes?

tools/exp_waves2.py: the fused sorted trace costs 148.8 / 365.5 /
668.5 ms at 2/4/8M lanes while its parts measured standalone at 2M
(kernel ~110, sort ~45) predict ~2x less growth. This times each op in
isolation at each lane count on REAL waves-state rays:

  key       ray_sort_key
  argsort   jnp.argsort(key)
  argsort2  argsort + argsort(perm) (the inverse build)
  fwd7      permute_rows of the 7 kernel inputs
  inv5      permute_rows of the 5 kernel outputs
  attr16    the (N,16) attribute row gather in resolve_inst_attributes
  kernel    inst_trace on pre-sorted rays
  trace     the full trace(sort_packets=True)

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
from path_tracer_tpu.ops.intersect import permute_rows, ray_sort_key, trace
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
    print(f'#   {label:10s} {dt:8.1f} ms', file=sys.stderr)
    return round(dt, 1)


def main():
    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)
    out = {}
    for waves in (1, 2, 4):
        config = RenderConfig(width=WIDTH, height=HEIGHT, waves=waves)
        state = wf.render(packed, config, 24, seed=0, layout=layout)
        o, d = state['origin'], state['direction']
        n = o.shape[1]
        t_in = jnp.full((n,), 1.0e7)
        float(jnp.sum(state['accum']['count']))
        print(f'# waves={waves} ({n} lanes)', file=sys.stderr)
        res = {}

        key_jit = jax.jit(lambda o, d: ray_sort_key(packed, o, d))
        res['key'] = timed('key', key_jit, o, d)
        res['argsort'] = timed('argsort',
                               jax.jit(lambda o, d: jnp.argsort(
                                   ray_sort_key(packed, o, d))), o, d)
        res['argsort2'] = timed(
            'argsort2',
            jax.jit(lambda o, d: jnp.argsort(jnp.argsort(
                ray_sort_key(packed, o, d)))), o, d)

        perm = jnp.argsort(key_jit(o, d))

        @jax.jit
        def fwd7(o, d, t, perm):
            return permute_rows([o[0], o[1], o[2], d[0], d[1], d[2], t],
                                perm)

        res['fwd7'] = timed('fwd7', fwd7, o, d, t_in, perm)

        @jax.jit
        def inv5(o, d, perm):
            fake = [o[0], o[1], d[2],
                    jax.lax.bitcast_convert_type(perm, jnp.float32),
                    jax.lax.bitcast_convert_type(perm, jnp.float32)]
            return permute_rows(fake, perm)

        res['inv5'] = timed('inv5', inv5, o, d, perm)

        @jax.jit
        def attr16(face):
            safe = jnp.where(face >= 0, face, 0) % packed.inst_attrs.shape[0]
            return jnp.take(packed.inst_attrs, safe, axis=0).T

        res['attr16'] = timed('attr16', attr16, perm)

        rows = fwd7(o, d, t_in, perm)
        so = jnp.stack(rows[0:3], axis=0)
        sd = jnp.stack(rows[3:6], axis=0)

        kern = jax.jit(partial(
            trace_inst.inst_trace, tlas_rows=layout.tlas_rows))
        res['kernel'] = timed(
            'kernel', lambda: kern(packed.inst_nodes, packed.inst_tris,
                                   packed.inst_rows, so, sd, rows[6]))

        trace_sorted = jax.jit(partial(trace, layout=layout,
                                       sort_packets=True))
        res['trace'] = timed(
            'trace', lambda: trace_sorted(packed, origin=o, direction=d))
        out[f'waves{waves}'] = res
        del state
    print(json.dumps(out))


if __name__ == '__main__':
    main()
