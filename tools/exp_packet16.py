"""A/B: packet height (rays per packet) in the v6 kernel.

Bigger packets amortize the fixed per-pop cost (loop skeleton + mask
crossing + push, ~316 cy) over more rays, at the price of a larger
node/leaf UNION per packet (pops/ray grows sublinearly with packet
size; tools/exp_packet_size.py measured the k<=1024 side of the
curve). This tool measures the realized trade on REAL sorted
mid-flight rays: packet_rows in {8 (production, 1024 rays), 16 (2048
rays)} x interleave {1, 2}.

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
    from path_tracer_tpu.scene.procedural import make_viking_hall_scene

    t0 = time.time()
    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=16 / 9)
    layout = SceneLayout.from_packed(packed)
    assert layout.packet_mode == 'inst'

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

    results = {}
    base = None
    for rows in (24, 32, 48, 64):
        for il in (1,):
            def run():
                out = trace_inst.inst_trace(
                    packed.inst_nodes, packed.inst_tris, packed.inst_rows,
                    ob, db, t_in, tlas_rows=layout.tlas_rows,
                    packet_rows=rows, interleave=il)
                float(jnp.sum(out[0]))
                return out

            out = run()  # compile + warm
            t1 = time.time()
            for _ in range(3):
                out = run()
            dt = (time.time() - t1) / 3
            tag = f'rows{rows}_il{il}'
            results[tag] = dict(ms=round(dt * 1e3, 1),
                                mrays=round(n / dt / 1e6, 2))
            print(f'# {tag:12s} {dt*1e3:7.1f} ms '
                  f'{results[tag]["mrays"]:6.2f} Mrays/s', file=sys.stderr)
            f = np.asarray(out[1])
            if base is None:
                base = f
            else:
                agree = float(((f >= 0) == (base >= 0)).mean())
                results[tag]['hit_agree'] = round(agree, 5)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
