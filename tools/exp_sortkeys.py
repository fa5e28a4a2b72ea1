"""Sort-key shootout on REAL wavefront rays.

Renders a few rounds of the actual viking-hall wavefront (so the ray
population is the renderer's own mix of fresh camera rays and bounce
rays mid-flight), pulls the ray state to host, then measures the v5
kernel's pops and wall time under different orderings:

  none          as-left by the previous round (already mostly sorted)
  oct15         current production key: octant<<15 | morton15
  oct12dir      octant + 3 finer direction bits (octant of the
                *secondary* component ordering) + morton12
  dir6_m12      6-bit direction bin (octant + dominant axis) + morton12
  morton        morton-major (known bad; sanity check)

Run alone on the axon TPU.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')


def morton3(cells, bits):
    import numpy as np
    m = np.zeros_like(cells[0])
    for b in range(bits):
        m = (m
             | (((cells[0] >> b) & 1) << (3 * b + 2))
             | (((cells[1] >> b) & 1) << (3 * b + 1))
             | (((cells[2] >> b) & 1) << (3 * b)))
    return m


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from path_tracer_tpu import RenderConfig, SceneLayout, compile_scene
    from path_tracer_tpu.integrator.wavefront import render
    from path_tracer_tpu.ops.trace_packet import wide_trace5
    from path_tracer_tpu.scene.procedural import make_viking_hall_scene

    t0 = time.time()
    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=16 / 9)
    layout = SceneLayout.from_packed(packed)
    config = RenderConfig(width=1920, height=1080)
    state = render(packed, config, 5, seed=0, layout=layout)
    # Host capture of the real mid-flight ray population. This is the
    # state AFTER round 5's sort+round, i.e. one round PAST the last
    # sort -- exactly what the next round's sort would see.
    o = np.asarray(state['origin'])
    d = np.asarray(state['direction'])
    print(f'# captured {o.shape[1]} real rays in {time.time()-t0:.1f}s',
          file=sys.stderr)

    lo = np.asarray(packed.tlas_min)[:, 0]
    hi = np.asarray(packed.tlas_max)[:, 0]
    span = np.maximum(hi - lo, 1e-6)
    q = np.clip((o - lo[:, None]) / span[:, None], 0.0, 1.0)

    octant = (((d[0] < 0).astype(np.int64) << 2)
              | ((d[1] < 0).astype(np.int64) << 1)
              | (d[2] < 0).astype(np.int64))
    ad = np.abs(d)
    dominant = np.argmax(ad, axis=0)         # 0..2
    # Secondary direction refinement: quantized ratio of the two minor
    # components to the dominant one (2 bits each -> 4 bits).
    ratio = np.sort(ad, axis=0)[:2] / np.maximum(ad.max(axis=0), 1e-6)
    r2 = (np.clip(ratio, 0, 0.999) * 4).astype(np.int64)  # (2, N) 2 bits

    keys = {}
    keys['none'] = np.arange(o.shape[1])
    cells15 = (q * 31.0).astype(np.int64)
    keys['oct15'] = (octant << 15) | morton3(cells15, 5)
    cells12 = (q * 15.0).astype(np.int64)
    keys['oct12dir'] = (((octant << 2) | r2[0]) << 12) | morton3(cells12, 4)
    keys['dir6_m12'] = ((((octant << 2) | (dominant & 3)) << 12)
                        | morton3(cells12, 4))
    keys['dir10_m9'] = ((((((octant << 2) | dominant) << 4)
                          | (r2[0] << 2) | r2[1]) << 9)
                        | morton3((q * 7.0).astype(np.int64), 3))
    keys['morton'] = morton3(cells15, 5) << 3 | octant

    t_in = jnp.full((o.shape[1],), 1e6, jnp.float32)
    # The production tables are v6 two-level now; this historical sweep
    # still measures the v5 flat kernel, so build its tables directly.
    from path_tracer_tpu.scene import bvh8
    from path_tracer_tpu.scene.compile import (
        _ENTITY_TO_SHAPE_TYPE, gather_world_tris)
    from path_tracer_tpu.scene.model import ENTITY_TYPE_MESH_INSTANCE
    instances = []
    index = 0
    for entity, world in scene.walk_entities_with_transform():
        if entity.type not in _ENTITY_TO_SHAPE_TYPE:
            continue
        if entity.type == ENTITY_TYPE_MESH_INSTANCE and entity.mesh is None:
            continue
        if entity.type == ENTITY_TYPE_MESH_INSTANCE:
            inv = np.linalg.inv(world.astype(np.float64)).astype(np.float32)
            instances.append((index, entity, world, inv))
        index += 1
    tris = gather_world_tris(instances)
    wide = bvh8.build_wide_bvh(*tris)
    w_nodes, w_tris, _, _ = bvh8.pack_wide_geom(wide, *tris)
    w_nodes, w_tris = jnp.asarray(w_nodes), jnp.asarray(w_tris)
    results = {}
    for name, key in keys.items():
        order = np.argsort(key, kind='stable')
        oo = jnp.asarray(o[:, order])
        dd = jnp.asarray(d[:, order])
        out = wide_trace5(w_nodes, w_tris,
                          oo, dd, t_in, stats=True)
        st = np.asarray(out[4])
        pops = int(st[:, 0].sum() + st[:, 1].sum())
        out = wide_trace5(w_nodes, w_tris,
                          oo, dd, t_in)
        float(jnp.sum(out[0]))
        t0 = time.time()
        for _ in range(3):
            out = wide_trace5(w_nodes, w_tris,
                              oo, dd, t_in)
            float(jnp.sum(out[0]))
        dt = (time.time() - t0) / 3
        results[name] = dict(ms=round(dt * 1e3, 1), pops=pops,
                             mrays=round(o.shape[1] / dt / 1e6, 2))
        print(f'# {name:10s} {dt*1e3:7.1f} ms  {results[name]["mrays"]:6.2f} '
              f'Mrays/s  pops {pops}', file=sys.stderr)

    print(json.dumps(results))


if __name__ == '__main__':
    main()
