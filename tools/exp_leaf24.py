"""Sweep leaf size and packet height together on real sorted rays.

Round 2 measured 24-triangle leaves 10% SLOWER at 1024-ray packets
("fatter leaf pops"); 3072-ray packets changed the fixed-cost/arith
balance, so the leaf-size knee may have moved. Sweeps (packet_rows,
leaf_max) on the viking hall with REAL mid-flight rays.

Run alone on the axon TPU (one python process at a time).
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
    from path_tracer_tpu import RenderConfig, compile_scene
    from path_tracer_tpu.integrator.wavefront import render
    from path_tracer_tpu.ops import trace_inst
    from path_tracer_tpu.ops.intersect import SceneLayout, ray_sort_key
    from path_tracer_tpu.scene.compile import (
        _build_inst_tables, collect_mesh_instances)
    from path_tracer_tpu.scene.procedural import make_viking_hall_scene

    t0 = time.time()
    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=16 / 9)
    layout = SceneLayout.from_packed(packed)

    config = RenderConfig(width=1920, height=1080)
    state = render(packed, config, 5, seed=0, layout=layout)
    o = np.asarray(state['origin'])
    d = np.asarray(state['direction'])
    n = o.shape[1]
    print(f'# captured {n} real rays in {time.time()-t0:.1f}s',
          file=sys.stderr)
    key = np.asarray(jax.jit(ray_sort_key)(packed, jnp.asarray(o),
                                           jnp.asarray(d)))
    order = np.argsort(key)
    ob = jnp.asarray(o[:, order])
    db = jnp.asarray(d[:, order])
    t_in = jnp.full((n,), 1e6, jnp.float32)

    instances, bounds = collect_mesh_instances(scene)
    tables = {}
    for leaf_max in (16, 24, 32):
        tb, t_rows = _build_inst_tables(instances, bounds,
                                        leaf_max=leaf_max)
        tables[leaf_max] = (
            jnp.asarray(tb['inst_nodes']), jnp.asarray(tb['inst_tris']),
            jnp.asarray(tb['inst_rows']), t_rows)
        print(f'# leaf{leaf_max}: nodes {tb["inst_nodes"].shape} '
              f'tris {tb["inst_tris"].shape}', file=sys.stderr)

    results = {}
    base_f = None
    for leaf_max in (16, 24, 32):
        nodes, tris, rows_tab, t_rows = tables[leaf_max]
        for prow in ((24,) if leaf_max != 16 else (24,)):
            def run():
                out = trace_inst.inst_trace(
                    nodes, tris, rows_tab, ob, db, t_in,
                    tlas_rows=t_rows, packet_rows=prow, interleave=1,
                    leaf_rows=leaf_max // 8)
                float(jnp.sum(out[0]))
                return out

            out = run()
            t1 = time.time()
            for _ in range(3):
                out = run()
            dt = (time.time() - t1) / 3
            tag = f'leaf{leaf_max}_rows{prow}'
            results[tag] = dict(ms=round(dt * 1e3, 1),
                                mrays=round(n / dt / 1e6, 2))
            t = np.asarray(out[0])
            if base_f is None:
                base_f = t
            else:
                results[tag]['t_agree'] = round(float(np.isclose(
                    t, base_f, rtol=2e-4, atol=2e-5).mean()), 5)
            print(f'# {tag:18s} {dt*1e3:7.1f} ms '
                  f'{results[tag]["mrays"]:6.2f} Mrays/s', file=sys.stderr)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
