"""Render the benchmark scene gallery to PNGs (docs/gallery/).

Visual proof that the framework renders its six BASELINE configs end
to end on the real TPU: each scene gets a fixed-seed progressive render
(rounds chosen per scene cost), tone-mapped and written as PNG with
the repo's own codec.

Runtime rules: memory/tpu-runtime-rules (one process, readback to time).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import numpy as np

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'docs', 'gallery')
WIDTH, HEIGHT = 960, 540


def main():
    import jax.numpy as jnp
    from path_tracer_tpu import RenderConfig, SceneLayout, compile_scene
    from path_tracer_tpu.core.constants import TONE_MAPPING_MODE_ACES
    from path_tracer_tpu.integrator.resolve import resolve
    from path_tracer_tpu.integrator.wavefront import render
    from path_tracer_tpu.utils.image import encode_png
    from path_tracer_tpu.scene.procedural import (
        make_360_scene, make_cornell_scene, make_multi_mesh_scene,
        make_sphere_array_scene, make_terrain_scene, make_viking_hall_scene)

    configs = [
        ('cornell', make_cornell_scene, 0, 800),
        ('spheres_dof', make_sphere_array_scene, 1, 400),
        ('viking_hall', make_viking_hall_scene, 0, 240),
        ('360_mixed', make_360_scene, 2, 240),
        ('multi_mesh', make_multi_mesh_scene, 0, 240),
        ('terrain', make_terrain_scene, 0, 64),
    ]
    os.makedirs(OUT_DIR, exist_ok=True)

    for name, make, cam_model, rounds in configs:
        t0 = time.time()
        packed = compile_scene(make(), aspect_ratio=WIDTH / HEIGHT)
        layout = SceneLayout.from_packed(packed)
        config = RenderConfig(width=WIDTH, height=HEIGHT,
                              camera_model=cam_model)
        chunk = min(48, rounds)
        state = None
        for _ in range(rounds // chunk):
            state = render(packed, config, chunk, seed=7, layout=layout,
                           state=state)
        # Auto-exposure for display: scale pre-tonemap so the mean
        # luminance sits at photographic middle gray (the renderer is
        # radiometric; scenes differ by orders of magnitude).
        xyz = np.asarray(state['accum']['xyz'])
        count = np.asarray(state['accum']['count'])
        mean_y = float((xyz[1] / np.maximum(count, 1.0)).mean())
        brightness = 0.18 / max(mean_y, 1e-6)
        img = np.asarray(resolve(state['accum'], WIDTH, HEIGHT,
                                 brightness=brightness,
                                 mode=TONE_MAPPING_MODE_ACES))
        spp = float(count.mean())
        path = os.path.join(OUT_DIR, f'{name}.png')
        with open(path, 'wb') as f:
            f.write(encode_png(img))
        print(f'{name}: {rounds} rounds (~{spp:.0f} spp) in '
              f'{time.time()-t0:.1f}s -> {path}', flush=True)


if __name__ == '__main__':
    main()
