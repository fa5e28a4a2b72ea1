"""Generate CPU golden images for bench.py's on-chip numerics check.

Renders each BASELINE config at low resolution with a fixed seed
through the portable CPU path and stores the resolved images. bench.py
re-renders the same frames on the real TPU (packet kernels, Mosaic
lowering, bf16 dots) and fails loudly if the output drifts beyond
Monte-Carlo-noise bands -- one bench run then proves speed AND
correctness on real hardware (round-2 verdict item 6).

Run on CPU: PYTHONPATH= JAX_PLATFORMS=cpu python tools/make_bench_goldens.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'data', 'bench_goldens')
WIDTH, HEIGHT = 192, 108
ROUNDS = 24
SEED = 123


def golden_configs():
    from path_tracer_tpu.scene.procedural import (
        make_360_scene, make_cornell_scene, make_multi_mesh_scene,
        make_sphere_array_scene, make_terrain_scene,
        make_viking_hall_scene)
    return [
        ('1_cornell', make_cornell_scene, 0),
        ('2_spheres_dof', make_sphere_array_scene, 1),
        ('3_viking_hall', lambda: make_viking_hall_scene(detail=1), 0),
        ('4_360_mixed', make_360_scene, 2),
        ('5_multi_mesh_4k', lambda: make_multi_mesh_scene(detail=1), 0),
        # On the TPU this frame runs the HBM-streaming inst kernel
        # (tables 2.3x over the VMEM budget), so the golden check
        # regression-tests the streamed traversal's numerics on-chip.
        ('6_terrain_stream', lambda: make_terrain_scene(side=900), 0),
    ]


def render_golden_frame(name, make, camera_model):
    """The exact deterministic frame bench.py re-renders on the TPU."""
    import numpy as np
    from path_tracer_tpu import RenderConfig, SceneLayout, compile_scene
    from path_tracer_tpu.integrator.resolve import resolve
    from path_tracer_tpu.integrator.wavefront import render

    scene = make()
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)
    config = RenderConfig(width=WIDTH, height=HEIGHT,
                          camera_model=camera_model)
    state = render(packed, config, ROUNDS, seed=SEED, layout=layout)
    img = np.asarray(resolve(state['accum'], WIDTH, HEIGHT))
    return img


def render_frame_seed(make, camera_model, seed):
    import numpy as np
    from path_tracer_tpu import RenderConfig, SceneLayout, compile_scene
    from path_tracer_tpu.integrator.resolve import resolve
    from path_tracer_tpu.integrator.wavefront import render

    scene = make()
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)
    config = RenderConfig(width=WIDTH, height=HEIGHT,
                          camera_model=camera_model)
    state = render(packed, config, ROUNDS, seed=seed, layout=layout)
    return np.asarray(resolve(state['accum'], WIDTH, HEIGHT))


def main():
    import jax
    import numpy as np

    assert jax.default_backend() == 'cpu', (
        'goldens must come from the portable CPU path '
        '(PYTHONPATH= JAX_PLATFORMS=cpu)')
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    only = set(sys.argv[1:])  # optional config names to (re)generate
    for name, make, cam in golden_configs():
        if only and name not in only:
            continue
        img = render_frame_seed(make, cam, SEED)
        # Per-scene Monte-Carlo noise floor: an independent-seed render
        # of the same frame. The TPU re-render decoheres from the CPU
        # one through traversal tie-breaks, so it compares like an
        # independent run; the pass band must be the measured noise,
        # not a fixed epsilon (viking's floor is ~24% mean-abs at this
        # spp while cornell's is <1%).
        other = render_frame_seed(make, cam, SEED + 1)
        noise = float(np.abs(img - other).mean() / (img.mean() + 1e-3))
        bias = float(abs(img.mean() - other.mean()) / (img.mean() + 1e-3))
        path = os.path.join(GOLDEN_DIR, f'{name}.npz')
        np.savez_compressed(path, image=img.astype(np.float32),
                            noise=np.float32(noise),
                            bias=np.float32(bias))
        print(f'{name}: mean {img.mean():.5f} noise {noise:.4f} '
              f'bias {bias:.4f} -> {path}')


if __name__ == '__main__':
    main()
