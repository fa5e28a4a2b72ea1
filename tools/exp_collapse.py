"""A/B the greedy vs DP-SAH wide-BVH collapse on the real chip.

For each collapse mode, rebuilds the viking-hall v5 tables and measures
kernel-only time + on-chip pop counters (interior/leaf) for coherent
primary rays and octant+Morton-sorted bounce-like rays (the same
synthetic workloads tools/profile_trace.py has tracked since round 2,
so numbers are comparable across rounds).

Run with the default (axon) environment; one python process at a time.
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
    from path_tracer_tpu.ops import trace_packet
    from path_tracer_tpu.scene import bvh8, compile as compile_mod
    from path_tracer_tpu.scene.procedural import make_viking_hall_scene

    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=16 / 9)

    # Recover the world-space triangle soup the packed tables were
    # built from (no cache on this path; cheap).
    instances = []
    from path_tracer_tpu.scene.compile import _ENTITY_TO_SHAPE_TYPE
    from path_tracer_tpu.scene.model import ENTITY_TYPE_MESH_INSTANCE
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
    tris = compile_mod.gather_world_tris(instances)
    f = len(tris[0])
    print(f'# viking hall: {f} world faces', file=sys.stderr)

    n = 1920 * 1080
    rng = np.random.default_rng(0)
    o = np.tile(np.array([0.0, -6.5, 2.4], np.float32)[:, None], (1, n))
    px = np.arange(n, dtype=np.int64)
    x = (px % 1920) / 1920.0 - 0.5
    y = (px // 1920) / 1080.0 - 0.5
    d = np.stack([x, np.ones(n, np.float32) * 0.9, y - 0.2]).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)

    ob = rng.uniform(-4, 4, (3, n)).astype(np.float32)
    ob[2] = np.abs(ob[2]) * 0.5 + 0.2
    db = rng.normal(size=(3, n)).astype(np.float32)
    db /= np.linalg.norm(db, axis=0, keepdims=True)
    from path_tracer_tpu.integrator.wavefront import _ray_sort_key
    key = np.asarray(jax.jit(_ray_sort_key)(packed, jnp.asarray(ob),
                                            jnp.asarray(db)))
    order = np.argsort(key)
    ob, db = ob[:, order], db[:, order]

    t_in = jnp.full((n,), 1e6, jnp.float32)
    results = {}
    cases = [('sah', 16, False), ('sah', 16, True), ('sah', 24, True),
             ('sah', 8, True)]
    for collapse, leaf_max, spatial in cases:
        mode = f'{collapse}{leaf_max}{"s" if spatial else ""}'
        t0 = time.time()
        wide = bvh8.build_wide_bvh(*tris, collapse=collapse,
                                   leaf_max=leaf_max, spatial=spatial)
        nodes_g, tris_g, attrs, fmap = bvh8.pack_wide_geom(wide, *tris)
        build_s = time.time() - t0
        nodes_g = jnp.asarray(nodes_g)
        tris_g = jnp.asarray(tris_g)
        leaf_rows = -(-leaf_max // 8)
        print(f'# {mode}: {wide.num_nodes} wide nodes, '
              f'{wide.num_leaves} leaves, {tris_g.shape[0]} tri rows, '
              f'build {build_s:.2f}s', file=sys.stderr)
        results[mode] = dict(nodes=wide.num_nodes, leaves=wide.num_leaves,
                             rows=int(tris_g.shape[0]))
        for name, oo, dd in (('primary', o, d), ('bounce', ob, db)):
            oo, dd = jnp.asarray(oo), jnp.asarray(dd)
            # Pops (stats variant; separate program, untimed).
            out = trace_packet.wide_trace5(nodes_g, tris_g, oo, dd, t_in,
                                           stats=True, leaf_rows=leaf_rows)
            st = np.asarray(out[4])
            interior, leafp = int(st[:, 0].sum()), int(st[:, 1].sum())
            # Timed: warm the exact non-stats program, then measure.
            out = trace_packet.wide_trace5(nodes_g, tris_g, oo, dd, t_in,
                                           leaf_rows=leaf_rows)
            float(jnp.sum(out[0]))
            reps = 3
            t0 = time.time()
            for _ in range(reps):
                out = trace_packet.wide_trace5(nodes_g, tris_g, oo, dd,
                                               t_in, leaf_rows=leaf_rows)
                float(jnp.sum(out[0]))
            dt = (time.time() - t0) / reps
            mrays = n / dt / 1e6
            pops_per_ray = (interior + leafp) / n
            print(f'# {mode}/{name}: {dt*1e3:.1f} ms  {mrays:.2f} Mrays/s  '
                  f'pops/ray {pops_per_ray:.3f} '
                  f'(interior {interior} leaf {leafp})', file=sys.stderr)
            results[mode][name] = dict(ms=dt * 1e3, mrays=mrays,
                                       interior=interior, leaf=leafp)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
