"""Ray-density scaling: do packet leaf unions shrink as rays-in-flight
grow?

The packet kernel shares traversal across 3072-ray packets; after the
(octant, origin-morton) sort a packet covers a contiguous key range.
With D independent sample waves in flight (D x 2.07M rays at 1080p),
each packet's key range shrinks ~D-fold, so its swept frustum
tightens and the leaf union should fall toward the per-ray need
(~10-20 leaves) from the measured ~170-320.  exp_oracle_key.py showed
redistribution by a smarter key CANNOT do this (the oracle key is 2x
worse); density is the remaining axis: same work per sample elsewhere
(sort, scatter, deposit scale linearly), fewer pops per sample here.

Measures pops/ray and kernel Mrays/s on real mid-flight viking-hall
bounce rays at 1x/2x/4x/8x density (iid states from different seeds --
a valid sample of the same wavefront distribution), and the argsort +
permute cost at each lane count.

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


def main():
    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)
    config = RenderConfig(width=WIDTH, height=HEIGHT)

    waves = []
    for seed in range(8):
        st = wf.render(packed, config, 4, seed=seed, layout=layout)
        waves.append((np.asarray(st['origin']), np.asarray(st['direction'])))
        print(f'# wave {seed} captured', file=sys.stderr)

    for density in (1, 2, 4, 8):
        o = np.concatenate([w[0] for w in waves[:density]], axis=1)
        d = np.concatenate([w[1] for w in waves[:density]], axis=1)
        n = o.shape[1]
        oj, dj = jnp.asarray(o), jnp.asarray(d)

        t0 = time.time()
        key = ray_sort_key(packed, oj, dj)
        perm = jnp.argsort(key)
        rows = permute_rows([oj[0], oj[1], oj[2], dj[0], dj[1], dj[2]], perm)
        float(jnp.sum(rows[0]))
        t_sort_cold = time.time() - t0
        t0 = time.time()
        key = ray_sort_key(packed, oj, dj)
        perm = jnp.argsort(key)
        rows = permute_rows([oj[0], oj[1], oj[2], dj[0], dj[1], dj[2]], perm)
        float(jnp.sum(rows[0]))
        t_sort = time.time() - t0

        so = jnp.stack(rows[0:3], axis=0)
        sd = jnp.stack(rows[3:6], axis=0)
        big = jnp.full((n,), BIG, jnp.float32)

        st = trace_inst.inst_trace(
            packed.inst_nodes, packed.inst_tris, packed.inst_rows,
            so, sd, big, tlas_rows=layout.tlas_rows, stats=True)
        counters = np.asarray(st[5])
        out = trace_inst.inst_trace(
            packed.inst_nodes, packed.inst_tris, packed.inst_rows,
            so, sd, big, tlas_rows=layout.tlas_rows)
        float(jnp.sum(out[0]))
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            out = trace_inst.inst_trace(
                packed.inst_nodes, packed.inst_tris, packed.inst_rows,
                so, sd, big, tlas_rows=layout.tlas_rows)
            float(jnp.sum(out[0]))
        dt = (time.time() - t0) / reps
        interior, leafp = int(counters[0]), int(counters[1])
        packets = n // (24 * 128)
        print(f'  D={density}  lanes {n:9d}  interior {interior:8d}  '
              f'leaf {leafp:8d}  leaf/packet {leafp/packets:6.1f}  '
              f'pops/ray {(interior+leafp)/n:.4f}  '
              f'{dt*1e3:7.1f} ms  {n/dt/1e6:6.2f} Mrays/s  '
              f'sort {t_sort*1e3:5.1f} ms (cold {t_sort_cold*1e3:6.1f})')


if __name__ == '__main__':
    main()
