"""A/B: Moller-Trumbore vs plane+barycentric-gradient leaf rows.

Same harness as tools/exp_woop.py (viking hall, REAL mid-flight
wavefront rays production-sorted, plus coherent primaries), comparing
LEAF_FMT 'mt' against 'bary': lanes hold [n | d0 | gu | cu | gv | cv]
so the kernel does one plane test (ft = (d0 - n.o)/(n.d)), one hit
point, and two gradient dot products. On paper ~22% fewer vector
issues per triangle than Moller-Trumbore -- and unlike 'woop' (7%
slower on-chip from 12 simultaneously-live column broadcasts) the
dependency chain keeps only ~5 broadcasts live at once.

Reports ms / Mrays/s per format and winner agreement.

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

    fmts = sys.argv[1:] or ['mt', 'bary']
    t0 = time.time()
    tables = {}
    for fmt in fmts:
        bvh8.LEAF_FMT = fmt
        scene = make_viking_hall_scene(detail=1)
        packed = compile_scene(scene, aspect_ratio=16 / 9)
        tables[fmt] = packed
    layout = SceneLayout.from_packed(tables[fmts[0]])
    assert layout.packet_mode == 'inst'
    print(f'# tables built in {time.time()-t0:.1f}s '
          f'(tris {tables[fmts[0]].inst_tris.shape})', file=sys.stderr)

    # Real mid-flight rays: the state one round past the last sort.
    bvh8.LEAF_FMT = fmts[0]
    config = RenderConfig(width=1920, height=1080)
    state = render(tables[fmts[0]], config, 5, seed=0, layout=layout)
    o = np.asarray(state['origin'])
    d = np.asarray(state['direction'])
    n = o.shape[1]
    print(f'# captured {n} real rays in {time.time()-t0:.1f}s',
          file=sys.stderr)
    key = np.asarray(jax.jit(ray_sort_key)(tables[fmts[0]], jnp.asarray(o),
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
    kp = np.asarray(jax.jit(ray_sort_key)(tables[fmts[0]], jnp.asarray(op),
                                          jnp.asarray(dp)))
    po = np.argsort(kp)
    opj, dpj = jnp.asarray(op[:, po]), jnp.asarray(dp[:, po])

    results = {}
    outs = {}
    for fmt in fmts:
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

    ref = fmts[0]
    tm, fm = outs[ref]
    for fmt in fmts[1:]:
        tw, fw = outs[fmt]
        hit_agree = float(((fm >= 0) == (fw >= 0)).mean())
        both = (fm >= 0) & (fw >= 0)
        t_agree = float(np.isclose(tm[both], tw[both], rtol=2e-4,
                                   atol=2e-5).mean())
        results[f'{fmt}_hit_agree'] = round(hit_agree, 5)
        results[f'{fmt}_t_agree'] = round(t_agree, 5)
        print(f'# {fmt} agreement vs {ref}: hits {hit_agree:.5f}  '
              f't {t_agree:.5f}', file=sys.stderr)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
