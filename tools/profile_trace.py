"""Profile the wide-BVH packet kernel on real TPU hardware.

Measures trace throughput for (a) coherent primary rays, (b) sorted
bounce-like rays, for each node-test mode, plus one full wavefront
round breakdown. Prints timings to stderr and a JSON summary to stdout.

Run with the default (axon) environment: python tools/profile_trace.py
Remember this runtime's rules: one python process at a time; a
readback is required to force execution (utils/profiling.py).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')


def readback(x):
    import jax.numpy as jnp
    return float(jnp.sum(x))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from path_tracer_tpu import RenderConfig, SceneLayout, compile_scene
    from path_tracer_tpu.ops import trace_wide
    from path_tracer_tpu.scene.procedural import make_viking_hall_scene

    t0 = time.time()
    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=1920 / 1080)
    layout = SceneLayout.from_packed(packed)
    w_nodes, w_tris = packed.wide_nodes, packed.wide_tris
    print(f'# compiled: nodes {w_nodes.shape} tris {w_tris.shape} '
          f'fit={layout.wide_fit} in {time.time()-t0:.1f}s', file=sys.stderr)

    n = 1920 * 1080
    rng = np.random.default_rng(0)

    # (a) primary-like rays: camera position, coherent directions per tile.
    o = np.tile(np.array([0.0, -6.5, 2.4], np.float32)[:, None], (1, n))
    px = np.arange(n, dtype=np.int64)
    x = (px % 1920) / 1920.0 - 0.5
    y = (px // 1920) / 1080.0 - 0.5
    d = np.stack([x, np.ones(n, np.float32) * 0.9, y - 0.2]).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)

    # (b) bounce-like rays: random origins inside the hall, random dirs,
    # then Morton+octant sorted like the wavefront driver does.
    ob = rng.uniform(-4, 4, (3, n)).astype(np.float32)
    ob[2] = np.abs(ob[2]) * 0.5 + 0.2
    db = rng.normal(size=(3, n)).astype(np.float32)
    db /= np.linalg.norm(db, axis=0, keepdims=True)
    from path_tracer_tpu.integrator.wavefront import _ray_sort_key
    key = np.asarray(jax.jit(_ray_sort_key)(packed, jnp.asarray(ob), jnp.asarray(db)))
    order = np.argsort(key)
    ob, db = ob[:, order], db[:, order]

    t_in = jnp.full((n,), 1e5, jnp.float32)
    results = {}
    for mode in ("exact",):
        for name, oo, dd in (('primary', o, d), ('bounce', ob, db)):
            oo = jnp.asarray(oo)
            dd = jnp.asarray(dd)
            t0 = time.time()
            out = trace_wide.wide_trace(w_nodes, w_tris, oo, dd, t_in,
                                        )
            hits = readback(out[1] >= 0)
            compile_s = time.time() - t0
            t0 = time.time()
            reps = 3
            for _ in range(reps):
                out = trace_wide.wide_trace(w_nodes, w_tris, oo, dd, t_in,
                                            )
                readback(out[0])
            dt = (time.time() - t0) / reps
            mrays = n / dt / 1e6
            results[f'{mode}_{name}'] = round(mrays, 2)
            print(f'# {mode:8s} {name:8s}: {dt*1e3:7.1f} ms '
                  f'({mrays:7.2f} Mrays/s) hits={hits:.0f} '
                  f'[compile {compile_s:.0f}s]', file=sys.stderr)

    print(json.dumps(results))


if __name__ == '__main__':
    main()
