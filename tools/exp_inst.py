"""Measure the v6 two-level kernel on a 1.5M-triangle instanced scene.

36 transformed instances of the 41k-triangle viking-hall mesh: the
world-flattened v5 tables would need ~150 MB (over the 64 MB VMEM
budget -> round-2 fell back to the ~1.3 Mrays/s portable path), while
the v6 object-space tables stay at one mesh copy. Reports Mrays/s for
primary-style and sorted bounce-style rays, plus the single-instance
v6-vs-v5 overhead on the plain viking hall.

Run with the default (axon) env; one python process at a time.
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
    from path_tracer_tpu.ops import trace_inst, trace_packet
    from path_tracer_tpu.ops.intersect import SceneLayout
    from path_tracer_tpu.scene.model import (
        ENTITY_TYPE_MESH_INSTANCE, Transform)
    from path_tracer_tpu.scene.procedural import make_viking_hall_scene

    rng = np.random.default_rng(0)
    results = {}

    def rays(n, span):
        o = rng.uniform(-span, span, (3, n)).astype(np.float32)
        o[2] = np.abs(o[2]) * 0.5 + 0.2
        d = rng.normal(size=(3, n)).astype(np.float32)
        d /= np.linalg.norm(d, axis=0, keepdims=True)
        return o, d

    def bench(label, fn, n):
        fn()  # compile + warm
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            out = fn()
        dt = (time.time() - t0) / reps
        mrays = n / dt / 1e6
        print(f'# {label}: {dt*1e3:.1f} ms  {mrays:.2f} Mrays/s',
              file=sys.stderr)
        return mrays

    # --- 36-instance hall grid: 1.49M world triangles -------------------
    scene = make_viking_hall_scene(detail=1)
    hall = [e for e in scene.walk_entities()
            if e.type == ENTITY_TYPE_MESH_INSTANCE][0]
    mesh = hall.mesh
    for gx in range(6):
        for gy in range(6):
            if gx == 0 and gy == 0:
                continue
            scene.create_entity(
                ENTITY_TYPE_MESH_INSTANCE, mesh=mesh,
                material=hall.material,
                transform=Transform(
                    position=[22.0 * gx, 22.0 * gy, 0.0],
                    rotation=[0.0, 0.0, float(rng.uniform(0, 6.28))]))
    packed = compile_scene(scene, aspect_ratio=16 / 9)
    layout = SceneLayout.from_packed(packed)
    faces = 36 * len(mesh.faces)
    print(f'# 36x hall: {faces} world tris, mode={layout.packet_mode}, '
          f'nodes {packed.inst_nodes.shape} tris {packed.inst_tris.shape} '
          f'fit={layout.inst_fit}', file=sys.stderr)
    assert layout.packet_mode == 'inst' and layout.inst_fit

    n = 1920 * 1080
    o, d = rays(n, 60.0)
    o[0] += 60.0
    o[1] += 60.0
    from path_tracer_tpu.integrator.wavefront import _ray_sort_key
    key = np.asarray(jax.jit(_ray_sort_key)(packed, jnp.asarray(o),
                                            jnp.asarray(d)))
    order = np.argsort(key)
    o, d = o[:, order], d[:, order]
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    t_in = jnp.full((n,), 1e6, jnp.float32)

    def run_inst():
        out = trace_inst.inst_trace(packed.inst_nodes, packed.inst_tris,
                                    packed.inst_rows, oj, dj, t_in,
                                    tlas_rows=layout.tlas_rows)
        float(jnp.sum(out[0]))
        return out

    results['hall36_bounce_mrays'] = bench('36x hall sorted bounce',
                                           run_inst, n)

    # --- single hall: v6 overhead vs the flat v5 tables -----------------
    scene1 = make_viking_hall_scene(detail=1)
    packed1 = compile_scene(scene1, aspect_ratio=16 / 9)
    layout1 = SceneLayout.from_packed(packed1)
    # v6 tables come straight from the (now always-instanced) compile;
    # v5 flat tables are built explicitly below for the A/B.
    from path_tracer_tpu.scene.compile import (
        _ENTITY_TO_SHAPE_TYPE, _build_inst_tables, gather_world_tris)
    from path_tracer_tpu.scene import bvh8
    instances, bounds = [], []
    index = 0
    for entity, world in scene1.walk_entities_with_transform():
        if entity.type not in _ENTITY_TO_SHAPE_TYPE:
            continue
        if entity.type == ENTITY_TYPE_MESH_INSTANCE and entity.mesh is None:
            continue
        if entity.type == ENTITY_TYPE_MESH_INSTANCE:
            inv = np.linalg.inv(world.astype(np.float64)).astype(np.float32)
            instances.append((index, entity, world, inv))
        index += 1
    from path_tracer_tpu.scene.compile import _shape_bounds
    for si, e, w, _ in instances:
        bounds.append(_shape_bounds(3, w, e.mesh))
    tables, t_rows = _build_inst_tables(instances, bounds)
    world = gather_world_tris(instances)
    wide_flat = bvh8.build_wide_bvh(*world)
    v5_nodes, v5_tris, _, _ = bvh8.pack_wide_geom(wide_flat, *world)
    v5_nodes, v5_tris = jnp.asarray(v5_nodes), jnp.asarray(v5_tris)

    o1, d1 = rays(n, 8.0)
    key = np.asarray(jax.jit(_ray_sort_key)(packed1, jnp.asarray(o1),
                                            jnp.asarray(d1)))
    order = np.argsort(key)
    o1, d1 = o1[:, order], d1[:, order]
    o1j, d1j = jnp.asarray(o1), jnp.asarray(d1)

    inst_nodes = jnp.asarray(tables['inst_nodes'])
    inst_tris = jnp.asarray(tables['inst_tris'])
    inst_rows = jnp.asarray(tables['inst_rows'])

    def run_v6_single():
        out = trace_inst.inst_trace(inst_nodes, inst_tris, inst_rows,
                                    o1j, d1j, t_in, tlas_rows=t_rows)
        float(jnp.sum(out[0]))
        return out

    def run_v5_single():
        out = trace_packet.wide_trace5(v5_nodes, v5_tris, o1j, d1j, t_in)
        float(jnp.sum(out[0]))
        return out

    results['hall1_v5_bounce_mrays'] = bench('1x hall v5 bounce',
                                             run_v5_single, n)
    results['hall1_v6_bounce_mrays'] = bench('1x hall v6 bounce',
                                             run_v6_single, n)

    # Primary-style rays: camera position, coherent directions.
    op = np.tile(np.array([0.0, -6.5, 2.4], np.float32)[:, None], (1, n))
    px = np.arange(n, dtype=np.int64)
    x = (px % 1920) / 1920.0 - 0.5
    y = (px // 1920) / 1080.0 - 0.5
    dp = np.stack([x, np.ones(n, np.float32) * 0.9,
                   y - 0.2]).astype(np.float32)
    dp /= np.linalg.norm(dp, axis=0, keepdims=True)
    opj, dpj = jnp.asarray(op), jnp.asarray(dp)

    def run_v6_primary():
        out = trace_inst.inst_trace(inst_nodes, inst_tris, inst_rows,
                                    opj, dpj, t_in, tlas_rows=t_rows)
        float(jnp.sum(out[0]))
        return out

    def run_v5_primary():
        out = trace_packet.wide_trace5(v5_nodes, v5_tris, opj, dpj, t_in)
        float(jnp.sum(out[0]))
        return out

    results['hall1_v5_primary_mrays'] = bench('1x hall v5 primary',
                                              run_v5_primary, n)
    results['hall1_v6_primary_mrays'] = bench('1x hall v6 primary',
                                              run_v6_primary, n)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
