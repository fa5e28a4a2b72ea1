"""A/B the v6 kernel at node width 16 vs 8 on the viking hall.

Rationale: the per-pop cost is dominated by fixed overheads (loop
skeleton ~150 cy, vector->scalar mask crossing ~130 cy, fetch/staging),
and a 16-wide node still fits ONE 128-lane row (96 AABB lanes + 16
metas + axis = 113), so doubling the arity amortizes those overheads
over 2x the children: the DP collapse produces ~2x fewer interior
nodes, and a pop of a 16-wide node replaces ~two 8-wide pops.

Measures Mrays/s for coherent primaries and octant-sorted bounce rays
on the single-instance viking hall, checks hit agreement, and prints a
JSON summary. Run in the default (axon) env; one process at a time.
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
    from path_tracer_tpu.ops import trace_inst
    from path_tracer_tpu.scene.compile import (
        _build_inst_tables, collect_mesh_instances)
    from path_tracer_tpu.scene.procedural import make_viking_hall_scene

    rng = np.random.default_rng(0)
    results = {}

    def bench(label, fn, n):
        fn()  # compile + warm
        t0 = time.time()
        reps = 4
        for _ in range(reps):
            out = fn()
        dt = (time.time() - t0) / reps
        mrays = n / dt / 1e6
        print(f'# {label}: {dt*1e3:.1f} ms  {mrays:.2f} Mrays/s',
              file=sys.stderr)
        return out, mrays

    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=16 / 9)
    instances, bounds = collect_mesh_instances(scene)

    n = 1920 * 1080
    t_in = jnp.full((n,), 1e6, jnp.float32)

    # Sorted bounce-style rays.
    o = rng.uniform(-8, 8, (3, n)).astype(np.float32)
    o[2] = np.abs(o[2]) * 0.5 + 0.2
    d = rng.normal(size=(3, n)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    key = np.asarray(jax.jit(_ray_sort_key)(packed, jnp.asarray(o),
                                            jnp.asarray(d)))
    order = np.argsort(key)
    o, d = o[:, order], d[:, order]
    oj, dj = jnp.asarray(o), jnp.asarray(d)

    # Coherent primaries.
    op = np.tile(np.array([0.0, -6.5, 2.4], np.float32)[:, None], (1, n))
    px = np.arange(n, dtype=np.int64)
    x = (px % 1920) / 1920.0 - 0.5
    y = (px // 1920) / 1080.0 - 0.5
    dp = np.stack([x, np.ones(n, np.float32) * 0.9,
                   y - 0.2]).astype(np.float32)
    dp /= np.linalg.norm(dp, axis=0, keepdims=True)
    opj, dpj = jnp.asarray(op), jnp.asarray(dp)

    hits = {}
    for width in (8, 16):
        tables, t_rows = _build_inst_tables(instances, bounds, width=width)
        nodes = jnp.asarray(tables['inst_nodes'])
        tris = jnp.asarray(tables['inst_tris'])
        rows = jnp.asarray(tables['inst_rows'])
        fmap = tables['inst_face_map']
        print(f'# width={width}: nodes {nodes.shape[0]} '
              f'tri_rows {tris.shape[0]} tlas {t_rows}', file=sys.stderr)
        results[f'w{width}_nodes'] = int(nodes.shape[0])

        def run(o_, d_):
            out = trace_inst.inst_trace(nodes, tris, rows, o_, d_, t_in,
                                        tlas_rows=t_rows, width=width)
            float(jnp.sum(out[0]))
            return out

        out_b, mrays_b = bench(f'w{width} bounce', lambda: run(oj, dj), n)
        out_p, mrays_p = bench(f'w{width} primary', lambda: run(opj, dpj), n)
        results[f'w{width}_bounce_mrays'] = round(mrays_b, 2)
        results[f'w{width}_primary_mrays'] = round(mrays_p, 2)
        face = np.asarray(out_b[1])
        hits[width] = (np.asarray(out_b[0]),
                       np.where(face >= 0, fmap[np.maximum(face, 0)], -1))

    t8, f8 = hits[8]
    t16, f16 = hits[16]
    agree = float(((f8 == f16) | (np.abs(t8 - t16) < 1e-4)).mean())
    results['bounce_hit_agree'] = round(agree, 6)
    print(f'# bounce hit agreement (face or t-tie): {agree:.6f}',
          file=sys.stderr)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
