"""Validate + measure HBM streaming on an over-VMEM unique-geometry scene.

Builds a ~1.6M-triangle displaced terrain (unique geometry -- no
instancing to share), whose v6 tables oversubscribe the 64 MB VMEM
budget ~1.6x, so the kernel keeps a resident prefix and streams cold
rows per pop. Checks hits against the portable traversal on a ray
subset, then measures sorted-bounce throughput vs the fully-resident
viking-hall rate (the round-2 verdict's "within 2x of the
VMEM-resident rate" bar, item 5b).

Run with the default (axon) env; one python process at a time.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')


def make_terrain_scene(side=900):
    """The shared config-6 terrain (scene/procedural.py), skyless for
    kernel-only measurement."""
    from path_tracer_tpu.scene.procedural import (
        make_terrain_scene as make)

    scene = make(side=side, with_sky=False)
    return scene, len(scene.meshes[0].faces)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from path_tracer_tpu import compile_scene
    from path_tracer_tpu.core.constants import SHAPE_INDEX_NONE
    from path_tracer_tpu.integrator.wavefront import _ray_sort_key
    from path_tracer_tpu.ops import trace_inst
    from path_tracer_tpu.ops.intersect import SceneLayout, trace

    t0 = time.time()
    scene, faces = make_terrain_scene()
    packed = compile_scene(scene, aspect_ratio=16 / 9)
    layout = SceneLayout.from_packed(packed)
    split = trace_inst.residency_split(packed.inst_nodes.shape,
                                       packed.inst_tris.shape,
                                       packed.inst_rows.shape)
    n_rows = int(packed.inst_nodes.shape[0]) + int(packed.inst_tris.shape[0])
    print(f'# terrain: {faces} tris, {n_rows} table rows '
          f'({n_rows * 512 / 2**20:.0f} MB), resident split {split}, '
          f'compile {time.time()-t0:.0f}s', file=sys.stderr)
    assert layout.packet_mode == 'inst' and layout.inst_fit
    res_rows = split[0] + split[1]
    assert res_rows < n_rows, 'scene must oversubscribe VMEM'

    rng = np.random.default_rng(0)
    # Correctness on a subset vs the portable traversal (on-chip).
    ns = 16 * 1024
    o = rng.uniform(-45, 45, (3, ns)).astype(np.float32)
    o[2] = 6.0 + np.abs(o[2]) * 0.1
    d = rng.normal(size=(3, ns)).astype(np.float32)
    d[2] = -np.abs(d[2]) - 0.3
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    hp = trace(packed, layout, oj, dj, use_packet=True)
    hq = trace(packed, layout, oj, dj, use_packet=False)
    sp, sq = np.asarray(hp['shape']), np.asarray(hq['shape'])
    agree = float((sp == sq).mean())
    m = (sp == sq) & (sq != SHAPE_INDEX_NONE)
    t_ok = bool(np.allclose(np.asarray(hp['time'])[m],
                            np.asarray(hq['time'])[m],
                            rtol=5e-4, atol=5e-4))
    print(f'# correctness vs portable: shape agree {agree:.4f}, '
          f'hits {int(m.sum())}, t close {t_ok}', file=sys.stderr)
    assert agree > 0.999 and t_ok

    # Throughput: sorted downward bounce-like rays across the terrain.
    n = 1920 * 1080
    o = rng.uniform(-45, 45, (3, n)).astype(np.float32)
    o[2] = 6.0 + np.abs(o[2]) * 0.1
    d = rng.normal(size=(3, n)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    key = np.asarray(jax.jit(_ray_sort_key)(packed, jnp.asarray(o),
                                            jnp.asarray(d)))
    order = np.argsort(key)
    o, d = o[:, order], d[:, order]
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    t_in = jnp.full((n,), 1e6, jnp.float32)

    def k():
        out = trace_inst.inst_trace(packed.inst_nodes, packed.inst_tris,
                                    packed.inst_rows, oj, dj, t_in,
                                    tlas_rows=layout.tlas_rows)
        float(jnp.sum(out[0]))
    k()
    t0 = time.time()
    for _ in range(3):
        k()
    dt = (time.time() - t0) / 3
    mrays = n / dt / 1e6
    print(f'# streamed bounce: {dt*1e3:.0f} ms  {mrays:.2f} Mrays/s '
          f'(resident viking-hall reference: ~7.8)', file=sys.stderr)
    print(json.dumps(dict(tris=faces, table_mb=n_rows * 512 / 2**20,
                          resident_rows=res_rows, total_rows=n_rows,
                          bounce_mrays=mrays)))


if __name__ == '__main__':
    main()
