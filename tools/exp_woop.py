"""A/B: Moller-Trumbore vs Woop unit-triangle leaf rows (LEAF_FMT).

Same viking-hall scene, same REAL mid-flight wavefront rays (captured
after 5 rendered rounds, then production-sorted), same v6 tables except
the leaf geometry encoding: 'mt' stores p0/e1/e2 and intersects with
per-ray cross products; 'woop' stores the unit-triangle transform
[M | -M p0] so the kernel does two small affine transforms + a divide
(~25% fewer vector issues per triangle, no per-slot count test).

Reports ms / Mrays/s per format for sorted bounce rays and coherent
primaries, plus winner agreement between the formats.

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
    from path_tracer_tpu.scene import bvh8
    from path_tracer_tpu.scene.procedural import make_viking_hall_scene

    t0 = time.time()
    tables = {}
    for fmt in ('mt', 'woop'):
        bvh8.LEAF_FMT = fmt
        scene = make_viking_hall_scene(detail=1)
        packed = compile_scene(scene, aspect_ratio=16 / 9)
        tables[fmt] = packed
    layout = SceneLayout.from_packed(tables['mt'])
    assert layout.packet_mode == 'inst'
    print(f'# tables built in {time.time()-t0:.1f}s '
          f'(tris {tables["mt"].inst_tris.shape})', file=sys.stderr)

    # Real mid-flight rays: the state one round past the last sort.
    config = RenderConfig(width=1920, height=1080)
    state = render(tables['mt'], config, 5, seed=0, layout=layout)
    o = np.asarray(state['origin'])
    d = np.asarray(state['direction'])
    n = o.shape[1]
    print(f'# captured {n} real rays in {time.time()-t0:.1f}s',
          file=sys.stderr)
    key = np.asarray(jax.jit(ray_sort_key)(tables['mt'], jnp.asarray(o),
                                           jnp.asarray(d)))
    order = np.argsort(key)
    ob = jnp.asarray(o[:, order])
    db = jnp.asarray(d[:, order])
    t_in = jnp.full((n,), 1e6, jnp.float32)

    # Coherent primary-style rays: one origin, small cone.
    rng = np.random.default_rng(0)
    op = np.tile(np.array([[0.0], [-6.0], [1.6]], np.float32), (1, n))
    dp = np.stack([rng.uniform(-0.4, 0.4, n),
                   np.ones(n),
                   rng.uniform(-0.25, 0.25, n)]).astype(np.float32)
    dp /= np.linalg.norm(dp, axis=0, keepdims=True)
    kp = np.asarray(jax.jit(ray_sort_key)(tables['mt'], jnp.asarray(op),
                                          jnp.asarray(dp)))
    po = np.argsort(kp)
    opj, dpj = jnp.asarray(op[:, po]), jnp.asarray(dp[:, po])

    results = {}
    outs = {}
    for fmt in ('mt', 'woop'):
        packed = tables[fmt]

        def run(oo, dd):
            out = trace_inst.inst_trace(
                packed.inst_nodes, packed.inst_tris, packed.inst_rows,
                oo, dd, t_in, tlas_rows=layout.tlas_rows, leaf_fmt=fmt)
            float(jnp.sum(out[0]))
            return out

        for tag, (oo, dd) in (('bounce', (ob, db)),
                              ('primary', (opj, dpj))):
            out = run(oo, dd)  # compile + warm
            t1 = time.time()
            for _ in range(3):
                out = run(oo, dd)
            dt = (time.time() - t1) / 3
            results[f'{fmt}_{tag}'] = dict(
                ms=round(dt * 1e3, 1), mrays=round(n / dt / 1e6, 2))
            print(f'# {fmt:5s} {tag:8s} {dt*1e3:7.1f} ms '
                  f'{results[f"{fmt}_{tag}"]["mrays"]:6.2f} Mrays/s',
                  file=sys.stderr)
            if tag == 'bounce':
                outs[fmt] = (np.asarray(out[0]), np.asarray(out[1]))

    tm, fm = outs['mt']
    tw, fw = outs['woop']
    hit_agree = float(((fm >= 0) == (fw >= 0)).mean())
    both = (fm >= 0) & (fw >= 0)
    t_agree = float(np.isclose(tm[both], tw[both], rtol=2e-4,
                               atol=2e-5).mean())
    results['hit_agree'] = round(hit_agree, 5)
    results['t_agree'] = round(t_agree, 5)
    print(f'# agreement: hits {hit_agree:.5f}  t {t_agree:.5f}',
          file=sys.stderr)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
