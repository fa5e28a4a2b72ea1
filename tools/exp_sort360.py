"""Where is the coherence-sort crossover now that the sort is in-trace?

SORT_MIN_FACES=24000 was calibrated when the sort cost ~85-90 ms/round
(separate co-sorted state); at that price the 22.7k-slot 360 scene ran
30% FASTER unsorted.  Commit a5b5f48 moved the permutation inside
trace() (7 forward gathers + one (N,) scatter inverse), roughly halving
its cost, so the crossover must be re-measured.  A/Bs end-to-end
Mrays/s sorted vs unsorted on the 360 scene plus small heightfield
scenes bracketing the old threshold.

Measured 2026-08-18 (v5e, 1080p, 12 rounds):

    scene                 slots   OFF      ON      ON/OFF
    heightfield n=48       5.8k   16.83    24.94   1.48
    heightfield n=64      10.9k   11.39    21.70   1.91
    heightfield n=80      17.7k    8.42    18.48   2.19
    360 mixed             22.7k   17.23    18.32   1.06

There is NO crossover left: the in-trace sort pays on every packet
scene measured, by 1.5-2.2x on mesh-dominated scenes and +6% even on
the analytic-heavy 360 mix -> SORT_MIN_FACES = 0 (gate removed; the
sort still only runs when the packet kernel does).

Runtime rules: memory/tpu-runtime-rules (one process, readback to time).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import jax
import jax.numpy as jnp

from path_tracer_tpu import RenderConfig, SceneLayout, compile_scene
from path_tracer_tpu.integrator import wavefront
from path_tracer_tpu.scene.procedural import make_360_scene

WIDTH, HEIGHT = 1920, 1080
CHUNK = 6
TIMED = 12


def make_heightfield_scene(n):
    import numpy as np
    from path_tracer_tpu.core.constants import MATERIAL_TYPE_BASIC_DIFFUSE
    from path_tracer_tpu.scene.model import (
        ENTITY_TYPE_CAMERA, ENTITY_TYPE_MESH_INSTANCE, Scene, Transform)
    from path_tracer_tpu.scene.procedural import heightfield
    scene = Scene()
    pos, nrm, uv, faces = heightfield(n, size=10.0, amplitude=1.2)
    mesh = scene.create_mesh(name=f'hf{n}', positions=pos, normals=nrm,
                             uvs=uv, faces=faces)
    mat = scene.create_material(MATERIAL_TYPE_BASIC_DIFFUSE, name='ground',
                                base_color=np.asarray([0.5, 0.45, 0.4]))
    scene.create_entity(ENTITY_TYPE_MESH_INSTANCE, mesh=mesh, material=mat)
    scene.create_entity(
        ENTITY_TYPE_CAMERA,
        transform=Transform(position=[0.0, -6.0, 3.0],
                            rotation=[np.pi / 2.4, 0, 0]))
    return scene


def measure(label, packed, layout, config):
    state = None
    for _ in range(2):
        state = wavefront.render(packed, config, CHUNK, seed=0,
                                 layout=layout, state=state)
    float(jnp.sum(state['accum']['count']))  # readback: force warm exec
    t0 = time.time()
    for _ in range(TIMED // CHUNK):
        state = wavefront.render(packed, config, CHUNK, layout=layout,
                                 state=state)
        jax.block_until_ready(state['accum']['xyz'])
    float(jnp.sum(state['accum']['count']))
    dt = time.time() - t0
    mrays = WIDTH * HEIGHT * TIMED / dt / 1e6
    print(f'{label}: {TIMED} rounds in {dt:.2f}s = {mrays:.2f} Mrays/s')
    return mrays


def run_ab(name, scene, camera_model=0):
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)
    config = RenderConfig(width=WIDTH, height=HEIGHT,
                          camera_model=camera_model)
    print(f'# {name}: wide_face_slots={layout.wide_face_slots}, '
          f'packet_mode={layout.packet_mode}')
    saved = wavefront.SORT_MIN_FACES
    try:
        wavefront.SORT_MIN_FACES = 10 ** 9  # force OFF
        off = measure(f'{name} sort OFF', packed, layout, config)
        wavefront.SORT_MIN_FACES = 0        # force ON
        on = measure(f'{name} sort ON ', packed, layout, config)
    finally:
        wavefront.SORT_MIN_FACES = saved
    print(f'{name}: ratio sorted/unsorted = {on / off:.3f}\n')


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [48, 64, 80]
    first = make_heightfield_scene(sizes[0])
    packed = compile_scene(first, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)
    config = RenderConfig(width=WIDTH, height=HEIGHT)
    measure('session warmup', packed, layout, config)

    for n in sizes:
        run_ab(f'heightfield n={n}', make_heightfield_scene(n))
    run_ab('360 mixed', make_360_scene(), camera_model=2)


if __name__ == '__main__':
    main()
