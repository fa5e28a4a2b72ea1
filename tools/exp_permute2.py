"""Transpose share of the packed row gather (permute_rows).

permute_rows stacks k rows channels-first then transposes to (N, k),
gathers, and transposes back -- two full 64 MB lane/sublane shuffles
around one gather at 2M lanes. After the skybox late-transpose win
(tools/exp_skytap3.py: a (N, 16) transpose was ~15 ms), this measures
how much of the in-trace sort's row-gather cost is the transposes:

  prod        stack(axis=0) -> .T -> take -> .T (current permute_rows)
  stack1      stack(axis=1) -> take -> column slices (no explicit .T)
  gather_only take on a PRE-PACKED (N, 8) matrix (floor: pure gather)
  pack_only   the stack+transposes with a static iota 'permutation'
              replaced by... same take but identity perm (gather cost
              should not depend on indices; sanity row)

Timed standalone (jit per variant, readback-forced), interleaved A/B,
on the production 7-row trace input (o3 d3 t) at 2M lanes.

Run alone on the axon TPU.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

REPS = 10


def main():
    import jax
    import jax.numpy as jnp
    from path_tracer_tpu import RenderConfig, SceneLayout, compile_scene
    from path_tracer_tpu.integrator import wavefront as wf
    from path_tracer_tpu.ops.intersect import ray_sort_key
    from path_tracer_tpu.scene.procedural import make_viking_hall_scene

    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=16 / 9)
    layout = SceneLayout.from_packed(packed)
    config = RenderConfig(width=1920, height=1080)
    state = wf.render(packed, config, 4, seed=0, layout=layout)
    float(jnp.sum(state['accum']['count']))
    o, d = state['origin'], state['direction']
    t_in = jnp.full(o.shape[1:], 1e6, jnp.float32)
    rows7 = [o[0], o[1], o[2], d[0], d[1], d[2], t_in]
    n = o.shape[1]
    perm = jax.jit(lambda o_, d_: jnp.argsort(ray_sort_key(packed, o_, d_)))(
        o, d)
    perm.block_until_ready()

    @jax.jit
    def prod(rows, perm):
        cast = list(rows) + [jnp.zeros(n, jnp.float32)]
        m = jnp.stack(cast, axis=0)           # (8, N)
        out = jnp.take(m.T, perm, axis=0).T   # (8, N)
        return [out[i] for i in range(7)]

    @jax.jit
    def stack1(rows, perm):
        cast = list(rows) + [jnp.zeros(n, jnp.float32)]
        m = jnp.stack(cast, axis=1)           # (N, 8) directly
        out = jnp.take(m, perm, axis=0)       # (N, 8)
        return [out[:, i] for i in range(7)]

    pre = jnp.stack(rows7 + [jnp.zeros(n, jnp.float32)], axis=1)
    pre.block_until_ready()

    @jax.jit
    def gather_only(pre, perm):
        return jnp.take(pre, perm, axis=0)

    @jax.jit
    def null(rows, perm):
        return [r + 1.0 for r in rows]

    def timeit(label, fn, *args):
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf))
        t0 = time.time()
        for _ in range(REPS):
            out = fn(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(jnp.sum(leaf))
        dt = (time.time() - t0) / REPS
        print(f'# {label:12s} {dt*1e3:7.1f} ms', file=sys.stderr)
        return round(dt * 1e3, 1)

    results = {}
    for rnd in range(2):
        results[f'null{rnd}'] = timeit(f'null{rnd}', null, rows7, perm)
        results[f'prod{rnd}'] = timeit(f'prod{rnd}', prod, rows7, perm)
        results[f'stack1_{rnd}'] = timeit(f'stack1_{rnd}', stack1, rows7,
                                          perm)
        results[f'gather_{rnd}'] = timeit(f'gather_{rnd}', gather_only,
                                          pre, perm)
    # Equality.
    a = prod(rows7, perm)
    b = stack1(rows7, perm)
    diff = max(float(jnp.max(jnp.abs(x - y))) for x, y in zip(a, b))
    results['max_abs_diff'] = diff
    print(f'# max |prod-stack1| = {diff}', file=sys.stderr)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
