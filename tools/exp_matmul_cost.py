"""Experiment: how much of the pop cost is the HIGHEST-precision outer
product? Times the identical kernel with DEFAULT (1-pass bf16) matmuls.
DEFAULT output is numerically wrong (truncated meta would corrupt
traversal) -- but meta/axis are read scalar-side from the exact table,
and boxes/triangles merely get bf16-perturbed, so the traversal still
terminates and the measured time is representative.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from path_tracer_tpu import compile_scene
    from path_tracer_tpu.ops import trace_wide
    from path_tracer_tpu.scene.procedural import make_viking_hall_scene

    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=16 / 9)
    w_nodes, w_tris = packed.wide_nodes, packed.wide_tris

    n = 1920 * 1080
    rng = np.random.default_rng(0)
    ob = rng.uniform(-4, 4, (3, n)).astype(np.float32)
    ob[2] = np.abs(ob[2]) * 0.5 + 0.2
    db = rng.normal(size=(3, n)).astype(np.float32)
    db /= np.linalg.norm(db, axis=0, keepdims=True)
    octant = ((db[0] < 0).astype(np.int64) << 2) \
        | ((db[1] < 0).astype(np.int64) << 1) | (db[2] < 0).astype(np.int64)
    order = np.argsort(octant, kind='stable')
    oo = jnp.asarray(ob[:, order])
    dd = jnp.asarray(db[:, order])
    t_in = jnp.full((n,), 1e5, jnp.float32)

    def bench(tag):
        f = jax.jit(trace_wide.wide_trace.__wrapped__,
                    static_argnames=('interpret', 'stats', 'interleave'))
        r = f(w_nodes, w_tris, oo, dd, t_in)
        hits = float(jnp.sum(r[1] >= 0))
        t0 = time.time()
        for _ in range(2):
            r = f(w_nodes, w_tris, oo, dd, t_in)
            float(jnp.sum(r[0]))
        dt = (time.time() - t0) / 2
        print(f'# {tag:10s}: {dt*1e3:8.1f} ms ({n/dt/1e6:6.2f} Mrays/s) '
              f'hits={hits:.0f}', file=sys.stderr)

    bench('HIGHEST')

    def outer_default(row):
        ones = jnp.ones((1, 128), jnp.float32)
        return jax.lax.dot_general(row, ones, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    trace_wide._outer = outer_default
    bench('DEFAULT')


if __name__ == '__main__':
    main()
