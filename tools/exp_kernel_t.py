"""On-chip A/B of the v3 (1024-ray packet) vs v4 (transposed 128-ray
sub-packet) trace kernels: hit agreement first (Mosaic lowering bugs
never show in interpret mode), then throughput on primary and
octant-sorted bounce rays, with pop counters.

Run alone on the axon TPU.
"""

import json
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
    from path_tracer_tpu.integrator.wavefront import _ray_sort_key
    from path_tracer_tpu.ops.trace_wide import wide_trace
    from path_tracer_tpu.ops.trace_packet import wide_trace5
    from path_tracer_tpu.scene.procedural import make_viking_hall_scene

    t0 = time.time()
    packed = compile_scene(make_viking_hall_scene(detail=1),
                           aspect_ratio=16 / 9)
    print(f'# compiled in {time.time()-t0:.1f}s nodes={packed.wide_nodes.shape}'
          f' tris_g={packed.wide_tris_g.shape}', file=sys.stderr)

    n = 1 << 21
    rng = np.random.default_rng(0)

    # Primary-like rays.
    op = np.tile(np.array([0.0, -6.5, 2.4], np.float32)[:, None], (1, n))
    px = np.arange(n, dtype=np.int64)
    x = (px % 1920) / 1920.0 - 0.5
    y = ((px // 1920) % 1080) / 1080.0 - 0.5
    dp = np.stack([x, np.full(n, 0.9, np.float32), y - 0.2]).astype(np.float32)
    dp /= np.linalg.norm(dp, axis=0, keepdims=True)

    # Bounce-like rays, octant-major sorted.
    ob = rng.uniform(-4, 4, (3, n)).astype(np.float32)
    ob[2] = np.abs(ob[2]) * 0.5 + 0.2
    db = rng.normal(size=(3, n)).astype(np.float32)
    db /= np.linalg.norm(db, axis=0, keepdims=True)
    key = np.asarray(jax.jit(_ray_sort_key)(
        packed, jnp.asarray(ob), jnp.asarray(db)))
    order = np.argsort(key)
    ob, db = ob[:, order], db[:, order]

    t_in = jnp.full((n,), 1e6, jnp.float32)
    results = {}

    def run(label, fn, nodes, tris, o, d, reps=4):
        o = jnp.asarray(o)
        d = jnp.asarray(d)
        out = fn(nodes, tris, o, d, t_in, stats=True)
        st = np.asarray(out[5])
        t_host = np.asarray(out[0])
        face = np.asarray(out[1])
        t0 = time.time()
        for _ in range(reps):
            out = fn(nodes, tris, o, d, t_in)
            float(jnp.sum(out[0]))
        dt = (time.time() - t0) / reps
        mrays = n / dt / 1e6
        res = dict(ms=round(dt * 1e3, 1), mrays=round(mrays, 2),
                   interior=int(st[:, 0].sum()), leaf=int(st[:, 1].sum()),
                   hits=int((face >= 0).sum()))
        print(f'# {label:18s} {dt*1e3:8.1f} ms  {mrays:6.2f} Mrays/s  '
              f'pops {res["interior"]}+{res["leaf"]}  hits {res["hits"]}',
              file=sys.stderr)
        return res, t_host, face

    for name, o, d in (('primary', op, dp), ('bounce', ob, db)):
        r3, t3, f3 = run(f'v3 {name}', wide_trace,
                         packed.wide_nodes, packed.wide_tris, o, d)
        r5, t5, f5 = run(f'v5 {name}', wide_trace5,
                         packed.wide_nodes_g, packed.wide_tris_g, o, d)
        agree = float(((f3 >= 0) == (f5 >= 0)).mean())
        m = (f3 >= 0) & (f5 >= 0)
        tclose = float(np.isclose(t3[m], t5[m], rtol=1e-4, atol=1e-4).mean())
        print(f'# {name}: hitmask agree {agree:.6f}, t agree {tclose:.6f}',
              file=sys.stderr)
        results[name] = dict(v3=r3, v5=r5, hit_agree=round(agree, 6),
                             t_agree=round(tclose, 6))

    print(json.dumps(results))


if __name__ == '__main__':
    main()
