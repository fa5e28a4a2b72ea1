"""Regenerate the golden-image regression fixtures (CPU, deterministic).

Run after INTENTIONAL radiometric changes:
    PYTHONPATH= JAX_PLATFORMS=cpu python tools/make_goldens.py
and review the diff of tests/fixtures/goldens.npz stats in the test run.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def scenes():
    from path_tracer_tpu.scene.procedural import (
        make_cornell_scene, make_default_scene)
    return {
        'cornell_32x16_r120': (make_cornell_scene(), 32, 16, 120),
        'default_32x16_r80': (make_default_scene(), 32, 16, 80),
    }


def main():
    from path_tracer_tpu import render_scene

    out = {}
    for name, (scene, w, h, rounds) in scenes().items():
        img = np.asarray(render_scene(scene, width=w, height=h,
                                      spp_rounds=rounds, seed=7))
        out[name] = img.astype(np.float32)
        print(f'{name}: mean {img.mean():.6f} max {img.max():.6f}')
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'tests', 'fixtures', 'goldens.npz')
    np.savez_compressed(path, **out)
    print('wrote', path)


if __name__ == '__main__':
    main()
