"""Benchmark: ray throughput of the wavefront tracer on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
the metric is Mrays/s/chip on the flagship mesh scene (the "viking hall"
stand-in for the Viking room: ~90k triangles, two-level BVH, HDR skybox)
at 1080p, matching BASELINE.md's target definition. vs_baseline is
measured against the 200 Mrays/s/chip north star.

Every wavefront round traces exactly one ray per pixel lane (occupancy
is kept full by in-place path regeneration), so rays = lanes * rounds.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
# Persistent XLA compilation cache: kernel recompiles through the remote
# compile relay cost minutes otherwise.
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

NORTH_STAR_MRAYS = 200.0
WIDTH, HEIGHT = 1920, 1080
WARMUP_ROUNDS = 4
TIMED_ROUNDS = 12
CHUNK = 2  # rounds per device call (long single calls trip watchdogs)


def main():
    import jax
    import jax.numpy as jnp
    from path_tracer_tpu import RenderConfig, SceneLayout, compile_scene
    from path_tracer_tpu.integrator.wavefront import render, reset
    from path_tracer_tpu.scene.procedural import make_viking_hall_scene

    t0 = time.time()
    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)
    faces = int(packed.face_positions.shape[2])
    print(f'# scene compiled: {faces} triangles, '
          f'{int(packed.mesh_node_a.shape[0])} BVH nodes in {time.time()-t0:.1f}s',
          file=sys.stderr)

    config = RenderConfig(width=WIDTH, height=HEIGHT)

    t0 = time.time()
    state = render(packed, config, WARMUP_ROUNDS, seed=0, layout=layout)
    # A device->host readback is REQUIRED here, not just block_until_ready:
    # this runtime defers Pallas-program execution until the first
    # readback (block_until_ready returns immediately for deferred work),
    # so timing without a readback would measure nothing.
    warm = float(jnp.sum(state['accum']['count']))
    print(f'# compile+warmup ({WARMUP_ROUNDS} rounds): {time.time()-t0:.1f}s, '
          f'{warm:.0f} samples', file=sys.stderr)

    t0 = time.time()
    for _ in range(TIMED_ROUNDS // CHUNK):
        state = render(packed, config, CHUNK, layout=layout, state=state)
        jax.block_until_ready(state['accum']['xyz'])
    # Force execution of any deferred tail before stopping the clock.
    float(jnp.sum(state['accum']['count']))
    elapsed = time.time() - t0

    lanes = WIDTH * HEIGHT
    mrays = lanes * TIMED_ROUNDS / elapsed / 1e6
    spp = float(jnp.mean(state['accum']['count']))
    print(f'# {TIMED_ROUNDS} rounds in {elapsed:.2f}s; mean spp so far {spp:.1f}',
          file=sys.stderr)

    print(json.dumps({
        'metric': 'Mrays/s/chip (viking-hall mesh, 1080p, wavefront rounds)',
        'value': round(mrays, 2),
        'unit': 'Mrays/s',
        'vs_baseline': round(mrays / NORTH_STAR_MRAYS, 3),
    }))


if __name__ == '__main__':
    main()
