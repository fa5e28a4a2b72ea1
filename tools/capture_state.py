"""Capture a real mid-flight wavefront state to artifacts/ for offline
(CPU) traversal analysis -- tools/exp_treelet.py reads it.

Saves origin/direction (lane order), the production sort key, and the
per-ray trace t (so offline simulators can verify against the chip).

Run alone on the axon TPU (memory/tpu-runtime-rules).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import jax.numpy as jnp
import numpy as np

from path_tracer_tpu import RenderConfig, SceneLayout, compile_scene
from path_tracer_tpu.integrator import wavefront as wf
from path_tracer_tpu.ops import trace_inst
from path_tracer_tpu.ops.intersect import ray_sort_key
from path_tracer_tpu.scene.procedural import make_viking_hall_scene

WIDTH, HEIGHT = 1920, 1080
ROUNDS = 24


def main():
    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)
    config = RenderConfig(width=WIDTH, height=HEIGHT)
    state = wf.render(packed, config, ROUNDS, seed=0, layout=layout)
    o, d = state['origin'], state['direction']
    key = np.asarray(ray_sort_key(packed, o, d))
    t, face, fu, fv, inst = trace_inst.inst_trace(
        packed.inst_nodes, packed.inst_tris, packed.inst_rows,
        o, d, jnp.full((o.shape[1],), 1.0e7, jnp.float32),
        tlas_rows=layout.tlas_rows)
    st = trace_inst.inst_trace(
        packed.inst_nodes, packed.inst_tris, packed.inst_rows,
        jnp.asarray(np.asarray(o)[:, np.argsort(key, kind='stable')]),
        jnp.asarray(np.asarray(d)[:, np.argsort(key, kind='stable')]),
        jnp.full((o.shape[1],), 1.0e7, jnp.float32),
        tlas_rows=layout.tlas_rows, stats=True)
    counters = np.asarray(st[5])
    os.makedirs('artifacts', exist_ok=True)
    np.savez_compressed(
        'artifacts/state_viking.npz',
        origin=np.asarray(o), direction=np.asarray(d), key=key,
        t=np.asarray(t), face=np.asarray(face),
        pops_interior=counters[0], pops_leaf=counters[1],
        nodes=np.asarray(packed.inst_nodes),
        tris=np.asarray(packed.inst_tris),
        inst_rows=np.asarray(packed.inst_rows),
        tlas_rows=np.int32(layout.tlas_rows))
    print(f'# saved artifacts/state_viking.npz: {o.shape[1]} lanes, '
          f'on-chip sorted pops interior={int(counters[0])} '
          f'leaf={int(counters[1])}', file=sys.stderr)


if __name__ == '__main__':
    main()
