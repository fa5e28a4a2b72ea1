"""End-to-end sample-wave density sweep: RenderConfig.waves on real
benchmark scenes.

tools/exp_density.py measured the KERNEL-side win (bounce pops/ray
0.0776 -> 0.0475, kernel 18.8 -> 39.5 Mrays/s from waves 1 -> 8 on
viking-hall bounce rays). This measures what survives end-to-end in
the fused production round (trace + sort + scatter + deposit + respawn
under one fori_loop program), where round-3 ablations showed the
non-kernel stages fuse nearly for free at waves=1 but their cost may
scale differently at 2-8x the lane count.

Reports, per scene and per waves in {1, 2, 4, 8}: wall time per round,
Mrays/s (rays = waves * n_pixels * rounds), samples/s, and estimated
time-to-64spp. The sweep answers: which `waves` should each bench
config ship with?

Run alone on the axon TPU (memory/tpu-runtime-rules).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import jax
import jax.numpy as jnp

from path_tracer_tpu import RenderConfig, SceneLayout, compile_scene
from path_tracer_tpu.integrator.wavefront import render
from path_tracer_tpu.scene.procedural import (
    make_cornell_scene, make_viking_hall_scene)

WIDTH, HEIGHT = 1920, 1080


def sweep(name, scene, waves_list=(1, 2, 4, 8), rounds=24, camera_model=0):
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)
    n_pix = WIDTH * HEIGHT
    print(f'# {name}: {int(packed.face_positions.shape[2])} tris')
    for waves in waves_list:
        config = RenderConfig(width=WIDTH, height=HEIGHT, waves=waves,
                              camera_model=camera_model)
        # Warm (compile + steady-state mix) with the exact chunked program.
        chunk = max(rounds // (2 if waves >= 4 else 1), 1)
        state = render(packed, config, chunk, seed=0, layout=layout)
        warm_count = float(jnp.sum(state['accum']['count']))
        t0 = time.time()
        done = 0
        while done < rounds:
            state = render(packed, config, chunk, layout=layout, state=state)
            jax.block_until_ready(state['accum']['xyz'])
            done += chunk
        count = float(jnp.sum(state['accum']['count']))
        dt = time.time() - t0
        rays = waves * n_pix * done
        spp_rate = (count - warm_count) / n_pix / dt
        t64 = 64.0 / spp_rate if spp_rate > 0 else float('inf')
        print(f'#   waves={waves}  {done} rounds  {dt:7.2f}s  '
              f'{rays / dt / 1e6:7.2f} Mrays/s  '
              f'{(count - warm_count) / dt / 1e6:6.2f} Msamples/s  '
              f't64 ~{t64:6.1f}s  ({dt / done * 1e3:.1f} ms/round)',
              flush=True)
        del state


def main():
    waves = tuple(int(w) for w in sys.argv[1:]) or (1, 2, 4, 8)
    sweep('viking_hall', make_viking_hall_scene(detail=1), waves_list=waves)


if __name__ == '__main__':
    main()
