"""Redistribution ceiling: what do packet unions cost under an ORACLE
sort key?

The per-packet leaf union is the measured floor of the current
(octant, origin-morton) sort (README "Next levers").  Any smarter
binning (treelet queues, origin-leaf keys, 6D curves) is bounded by
the ORACLE: sort rays by the leaf row of their TRUE hit (taken from a
first trace), so each packet's rays all terminate in the same leaf.
If even oracle packets pay big unions, redistribution cannot break the
floor and the next lever must be per-pop cost instead; if the oracle
collapses pops, a practical key (e.g. the ray's ORIGIN leaf, known for
free from the previous round's hit) is worth building.

Keys measured on real mid-flight viking-hall bounce rays:
  prod          (octant << 15) | origin-morton15 (production)
  hitleaf       true hit leaf row (misses last)         [oracle]
  oct_hitleaf   octant major, hit leaf minor            [oracle]
  hitleaf_oct   hit leaf major, octant minor            [oracle]

Run alone on the axon TPU (memory/tpu-runtime-rules).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import jax
import jax.numpy as jnp
import numpy as np

from path_tracer_tpu import RenderConfig, SceneLayout, compile_scene
from path_tracer_tpu.integrator import wavefront as wf
from path_tracer_tpu.ops import trace_inst
from path_tracer_tpu.ops.intersect import permute_rows, ray_sort_key
from path_tracer_tpu.scene.procedural import make_viking_hall_scene

WIDTH, HEIGHT = 1920, 1080
BIG = 1.0e7


def run(packed, layout, o, d, t_in, label, reps=3):
    st = trace_inst.inst_trace(
        packed.inst_nodes, packed.inst_tris, packed.inst_rows,
        o, d, t_in, tlas_rows=layout.tlas_rows, stats=True)
    counters = np.asarray(st[5])
    n = o.shape[1]
    # Warm the non-stats program before timing (the stats program is a
    # different jit cache entry; exp_tseed.py's baseline row paid the
    # first-execution overhead inside its timed loop).
    out = trace_inst.inst_trace(
        packed.inst_nodes, packed.inst_tris, packed.inst_rows,
        o, d, t_in, tlas_rows=layout.tlas_rows)
    float(jnp.sum(out[0]))
    t0 = time.time()
    for _ in range(reps):
        out = trace_inst.inst_trace(
            packed.inst_nodes, packed.inst_tris, packed.inst_rows,
            o, d, t_in, tlas_rows=layout.tlas_rows)
        float(jnp.sum(out[0]))
    dt = (time.time() - t0) / reps
    interior, leafp = int(counters[0]), int(counters[1])
    print(f'  {label:14s} interior {interior:8d}  leaf {leafp:8d}  '
          f'{dt*1e3:7.1f} ms  {n/dt/1e6:6.2f} Mrays/s')
    return out


def main():
    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)
    config = RenderConfig(width=WIDTH, height=HEIGHT)

    state = wf.render(packed, config, 4, seed=0, layout=layout)
    float(jnp.sum(state['accum']['count']))
    o, d = state['origin'], state['direction']
    n = o.shape[1]
    big = jnp.full((n,), BIG, jnp.float32)

    # Oracle inputs: the true hit of every ray (one unsorted trace).
    t_true, f_true, _, _, _ = trace_inst.inst_trace(
        packed.inst_nodes, packed.inst_tris, packed.inst_rows,
        o, d, big, tlas_rows=layout.tlas_rows)
    f_true = np.asarray(f_true)
    leaf_row = np.where(f_true >= 0, f_true // 8, 1 << 24)

    od = np.asarray(d)
    octant = (((od[0] < 0).astype(np.int64) << 2)
              | ((od[1] < 0).astype(np.int64) << 1)
              | (od[2] < 0).astype(np.int64))

    keys = {
        'prod': np.asarray(ray_sort_key(packed, o, d)).astype(np.int64),
        'hitleaf': leaf_row.astype(np.int64),
        'oct_hitleaf': (octant << 25) | leaf_row.astype(np.int64),
        'hitleaf_oct': (leaf_row.astype(np.int64) << 3) | octant,
    }

    print(f'# viking bounce rays ({n} lanes), oracle key sweep:')
    for name, key in keys.items():
        perm = jnp.asarray(np.argsort(key, kind='stable').astype(np.int32))
        rows = permute_rows([o[0], o[1], o[2], d[0], d[1], d[2]], perm)
        so = jnp.stack(rows[0:3], axis=0)
        sd = jnp.stack(rows[3:6], axis=0)
        run(packed, layout, so, sd, big, name)


if __name__ == '__main__':
    main()
